"""Gazetteer-scale evidence: mention-detection kernel at 120k and 10^6 aliases.

Round-1 verdict asked for (a) no driver-side row materialization of the dico
(done: Arrow IPC broadcast, reden_spark/operators/mentions.py) and (b) bench
evidence at >= 100k terms; round-2 verdict extended that to the shared-storage
handoff at >= 10^6 aliases. This script runs the warm mention-detection kernel
over the bench corpus three times: the stock ~16k-alias gazetteer (broadcast),
a 120k-alias gazetteer (broadcast), and a 10^6-alias gazetteer shipped via
file_terms_handle (terms written as parquet by a distributed job, workers read
+ compile once per process — the >GB cluster path where torrent-broadcast
bandwidth would become the bottleneck). Synthetic aliases are generated
JVM-side with column expressions; as in a real BnF/Geonames dictionary, the
overwhelming majority never occur in the text. Prints one JSON line with all
throughputs plus one-time per-worker matcher compile cost and payload sizes.

Usage: python scripts/bench_gazetteer_scale.py [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--n-extra", type=int, default=104_000)
    ap.add_argument("--n-extra-file", type=int, default=1_000_000)
    args = ap.parse_args()

    import tempfile

    from pyspark.sql import functions as F

    from bench import ensure_bench_data
    from reden_spark.functions.gazetteer import GazetteerMatcher
    from reden_spark.operators.mentions import broadcast_terms, detect_mentions
    from reden_spark.session import get_spark

    data = ensure_bench_data()
    spark = get_spark("gazetteer-scale", master=f"local[{args.cpus}]")
    try:
        tr = spark.read.parquet(str(data / "transcripts.parquet")).repartition(256).localCheckpoint(eager=True)
        n_turns = tr.count()
        stock = spark.read.parquet(str(data / "mention_terms.parquet")).select("term")
        # ~104k synthetic aliases built entirely JVM-side (no driver loop):
        # "<First> <Syllable><Suffix><id>" two-word proper-noun-ish forms that
        # do not occur in the corpus text (realistic dead weight of a large KB
        # dictionary). element_at is 1-based.
        firsts = F.array(*[F.lit(x) for x in
                           ["Jean", "Marie", "Pierre", "Luc", "Anne", "Paul",
                            "Henri", "Clara", "Denis", "Emile", "Fanny", "Gilles"]])
        roots = F.array(*[F.lit(x) for x in
                          ["Bar", "Mont", "Vil", "Cha", "Ger", "Lau", "Per",
                           "Rou", "Sab", "Tre", "Valo", "Neu", "Ormes", "Quin"]])
        sufs = F.array(*[F.lit(x) for x in
                         ["ville", "mont", "court", "ac", "y", "ieu", "as", "an", "ois", "ec"]])
        def synth(n: int):
            return spark.range(n).select(
                F.concat(
                    F.element_at(firsts, (F.pmod(F.col("id"), F.lit(12)) + 1).cast("int")),
                    F.lit(" "),
                    F.element_at(roots, (F.pmod(F.col("id") / 12, F.lit(14)) + 1).cast("int")),
                    F.element_at(sufs, (F.pmod(F.col("id") / 168, F.lit(10)) + 1).cast("int")),
                    F.col("id").cast("string"),
                ).alias("term")
            )

        big = stock.unionByName(synth(args.n_extra))
        huge = stock.unionByName(synth(args.n_extra_file))

        results: dict[str, dict] = {}
        for label, terms, terms_path in (
            ("stock", stock, None),
            ("big", big, None),
            ("huge_file", huge, tempfile.mkdtemp(prefix="gaz_terms_") + "/terms"),
        ):
            n_terms = terms.distinct().count()
            entry: dict = {"n_terms": n_terms, "handoff": "file" if terms_path else "broadcast"}
            if terms_path is None:
                bc = broadcast_terms(terms)
                entry["broadcast_mb"] = round(len(bc.value) / 2**20, 2)
                term_list = __import__("pyarrow").ipc.open_stream(
                    __import__("pyarrow").BufferReader(bc.value)
                ).read_all().column("term").to_pylist()
                t0 = time.time()
                GazetteerMatcher(term_list)
                entry["matcher_compile_sec"] = round(time.time() - t0, 2)
                bc.destroy()

            m = detect_mentions(tr, terms, terms_path=terms_path)
            t0 = time.time()
            m.agg(F.count("*")).collect()  # cold: JIT + worker spawn + per-worker compile
            entry["cold_elapsed_sec"] = round(time.time() - t0, 2)
            t0 = time.time()
            m.agg(F.count("*")).collect()
            warm = time.time() - t0
            if terms_path is not None:
                import glob as _g
                import os as _os

                entry["terms_parquet_mb"] = round(
                    sum(_os.path.getsize(f) for f in _g.glob(terms_path + "/*.parquet")) / 2**20, 2
                )
            entry["warm_elapsed_sec"] = round(warm, 2)
            entry["turns_per_sec"] = round(n_turns / warm)
            results[label] = entry
        out = {"experiment": "gazetteer_scale", "cpus": args.cpus, "n_turns": n_turns, **results}
        print(json.dumps(out))
        art = Path(__file__).resolve().parent.parent / "bench_artifacts" / "gazetteer_scale.json"
        art.write_text(json.dumps(out, indent=2) + "\n")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
