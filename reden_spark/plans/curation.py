"""The five-stage checkpointed CURATION pipeline — the end-to-end recipe a
100 TB training-data run executes over a `documents` corpus:

    documents -> pairs -> clusters -> holdout -> decontam -> packed

Each stage reads the previous stage's checkpoint and writes its own through
sources.storage (manifest + per-partition lineage counters, identical
machinery to the KG pipeline in plans/pipeline.py); `--from-stage` (or a
missing/invalidated manifest) recomputes from that point. Launchable via

    spark-submit --py-files reden_spark.zip reden_spark/plans/curation.py \
        --data-dir /root/testdata/sf0.01 --out-dir /tmp/curation_out

Stage semantics (exact twins of the contract row `curation_pipeline` and its
DuckDB oracle, driver_contract.O_CURATION_PIPELINE):

* pairs    — MinHash-LSH near-dup candidate pairs, exact-Jaccard verified
             (operators/dedup.minhash_lsh_pairs). The only corpus-quadratic
             hazard of the whole recipe, banded + saltable.
* clusters — transitive closure of the pair graph + keep-best-doc policy
             (operators/curation.dedup_clusters; reuses the KG
             connected-components operator).
* holdout  — deterministic stratified eval carve-out over the FULL corpus
             (eval membership is decided before dedup policy, so a duplicate
             of an eval doc can never leak into training via its kept twin).
* decontam — flag kept training docs sharing any word 8-gram with the holdout
             (operators/curation.decontaminate).
* packed   — concat-and-chunk sequence packing of the clean survivors into
             sharded ~budget-token training sequences
             (operators/curation.pack_sequences), joined with cluster
             provenance — one row per packed doc, the table a trainer reads.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# absolute imports + bootstrap so the module works BOTH as a package member
# and as a bare script path handed to spark-submit (which runs the file as
# __main__ with no parent package — relative imports would raise ImportError
# before main() ever ran)
if __package__ in (None, ""):
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from reden_spark.operators.curation import (  # noqa: E402
    decontaminate,
    dedup_clusters,
    pack_sequences,
    stratified_sample,
)
from reden_spark.operators.dedup import minhash_lsh_pairs  # noqa: E402
from reden_spark.sources import storage  # noqa: E402

STAGES = ["pairs", "clusters", "holdout", "decontam", "packed"]


def run_curation(
    spark: SparkSession,
    data_dir: str | Path,
    out_dir: str | Path,
    from_stage: str | None = None,
    n_hashes: int = 12,
    shingle_n: int = 3,
    bands: int = 4,
    threshold: float = 0.5,
    holdout_fraction: float = 0.2,
    stratum_col: str = "lang",
    decontam_shingle_n: int = 8,
    budget: int = 512,
    n_shards: int = 8,
    salt: int | str = "auto",
    hot_band_cap: int = 10_000,
) -> dict[str, DataFrame]:
    """Run (or resume) the curation pipeline; returns the stage DataFrames.

    Scale shape: `pairs`/`clusters` are dup-sized (orders smaller than the
    corpus); `holdout` is fraction-sized; only `decontam` and `packed` are
    corpus-sized, and both are one-shuffle operators. Checkpointing the pair
    table is what a real run does too — every downstream policy change
    (keep-policy, threshold sweeps) re-reads it instead of re-running the
    corpus-dominant shingle/signature pass.
    """
    data = Path(data_dir)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    if from_stage is not None:
        idx = STAGES.index(from_stage)
        storage.invalidate_from(out, STAGES[idx:])

    timings: dict[str, float] = {}

    def stage(name: str, compute) -> DataFrame:
        if storage.stage_exists(out, name):
            return storage.read_stage(spark, out, name)
        spark.sparkContext.setJobGroup(f"reden-cur-{name}", f"curation stage {name}")
        t0 = time.time()
        try:
            df = compute()
            storage.write_stage(df, out, name)
        finally:
            spark.sparkContext.setJobGroup("", "")
        timings[name] = time.time() - t0
        return storage.read_stage(spark, out, name)

    docs = spark.read.parquet(str(data / "documents.parquet"))

    pairs = stage(
        "pairs",
        lambda: minhash_lsh_pairs(
            docs, n_hashes, shingle_n, bands, threshold, salt=salt, hot_band_cap=hot_band_cap
        ),
    )
    clusters = stage("clusters", lambda: dedup_clusters(docs, pairs))
    holdout_ids = stage(
        "holdout",
        lambda: stratified_sample(docs, holdout_fraction, stratum_col).select("doc_id", "stratum"),
    )

    def compute_decontam() -> DataFrame:
        kept = clusters.filter("keep").select("doc_id")
        train = docs.join(kept, "doc_id", "left_semi").join(holdout_ids, "doc_id", "left_anti")
        holdout = docs.join(holdout_ids, "doc_id", "left_semi")
        return decontaminate(train, holdout, decontam_shingle_n)

    decontam = stage("decontam", compute_decontam)

    def compute_packed() -> DataFrame:
        clean_ids = decontam.filter(~F.col("contaminated")).select("doc_id")
        kept = clusters.filter("keep").select("doc_id")
        clean = (
            docs.join(kept, "doc_id", "left_semi")
            .join(holdout_ids, "doc_id", "left_anti")
            .join(clean_ids, "doc_id", "left_semi")
        )
        return pack_sequences(clean, budget, n_shards).join(
            clusters.select("doc_id", "cluster_id", "cluster_size"), "doc_id"
        ).select(
            "doc_id", "cluster_id", "cluster_size", "shard", "n_tokens", "start_offset", "seq_idx"
        )

    packed = stage("packed", compute_packed)

    if timings:
        (out / "_timings.json").write_text(json.dumps(timings))
    return {
        "pairs": pairs,
        "clusters": clusters,
        "holdout": holdout_ids,
        "decontam": decontam,
        "packed": packed,
    }


def main() -> None:
    import os

    from reden_spark.session import get_spark

    ap = argparse.ArgumentParser(description="training-data curation pipeline")
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--from-stage", choices=STAGES)
    ap.add_argument("--master", default=None)
    ap.add_argument("--holdout-fraction", type=float, default=0.2)
    ap.add_argument("--budget", type=int, default=512)
    ap.add_argument("--n-shards", type=int, default=8)
    ap.add_argument(
        "--salt",
        type=lambda v: v if v == "auto" else int(v),
        default="auto",
        help="hot-band salt for skewed corpora; 'auto' (default) probes band sizes at runtime",
    )
    ap.add_argument(
        "--hot-band-cap",
        type=int,
        default=10_000,
        help="per-band comparison budget (cap^2 pairs per task) before the auto salt engages",
    )
    a = ap.parse_args()

    spark = get_spark("reden-curation", master=a.master or os.environ.get("SPARK_MASTER"))
    t0 = time.time()
    dfs = run_curation(
        spark,
        a.data_dir,
        a.out_dir,
        a.from_stage,
        holdout_fraction=a.holdout_fraction,
        budget=a.budget,
        n_shards=a.n_shards,
        salt=a.salt,
        hot_band_cap=a.hot_band_cap,
    )
    print(
        json.dumps(
            {
                "elapsed_sec": time.time() - t0,
                "pairs": dfs["pairs"].count(),
                "packed": dfs["packed"].count(),
            }
        )
    )


if __name__ == "__main__":
    main()
