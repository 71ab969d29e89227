"""Gazetteer-scale evidence: mention-detection kernel at a 120k-alias dictionary.

Round-1 verdict item 9 asked for (a) no driver-side row materialization of the
dico (done: Arrow IPC broadcast, reden_spark/operators/mentions.py:48) and
(b) bench evidence at >= 100k terms. This script runs the warm mention-detection
kernel over the bench corpus twice — with the stock ~16k-alias gazetteer and
with a 120k-alias gazetteer (the stock aliases plus ~104k synthetic aliases
generated JVM-side with Spark column expressions; like a real BnF/Geonames
dictionary, the overwhelming majority of aliases never occur in the text) —
and prints one JSON line with both throughputs plus the one-time per-worker
matcher compile cost and the Arrow broadcast payload size.

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
    args = ap.parse_args()

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
        synth = (
            spark.range(args.n_extra)
            .select(
                F.concat(
                    F.element_at(firsts, (F.pmod(F.col("id"), F.lit(12)) + 1).cast("int")),
                    F.lit(" "),
                    F.element_at(roots, (F.pmod(F.col("id") / 12, F.lit(14)) + 1).cast("int")),
                    F.element_at(sufs, (F.pmod(F.col("id") / 168, F.lit(10)) + 1).cast("int")),
                    F.col("id").cast("string"),
                ).alias("term")
            )
        )
        big = stock.unionByName(synth)

        results: dict[str, dict] = {}
        for label, terms in (("stock", stock), ("big", big)):
            n_terms = terms.distinct().count()
            bc = broadcast_terms(terms)
            payload_mb = len(bc.value) / 2**20
            term_list = __import__("pyarrow").ipc.open_stream(
                __import__("pyarrow").BufferReader(bc.value)
            ).read_all().column("term").to_pylist()
            t0 = time.time()
            GazetteerMatcher(term_list)
            compile_s = time.time() - t0
            bc.destroy()

            m = detect_mentions(tr, terms)
            m.agg(F.count("*")).collect()  # cold: JIT + worker spawn + compile
            t0 = time.time()
            m.agg(F.count("*")).collect()
            warm = time.time() - t0
            results[label] = {
                "n_terms": n_terms,
                "broadcast_mb": round(payload_mb, 2),
                "matcher_compile_sec": round(compile_s, 2),
                "warm_elapsed_sec": round(warm, 2),
                "turns_per_sec": round(n_turns / warm),
            }
        out = {"experiment": "gazetteer_scale", "cpus": args.cpus, "n_turns": n_turns, **results}
        print(json.dumps(out))
        art = Path(__file__).resolve().parent.parent / "bench_artifacts" / "gazetteer_scale.json"
        art.write_text(json.dumps(out, indent=2) + "\n")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
