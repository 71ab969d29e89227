"""Stage checkpoint storage with manifests + per-partition lineage counters.

North-rule requirements: every pipeline stage checkpoints to a table snapshot,
carries per-partition lineage counters, and the pipeline is resumable from any
stage. The reference's analogue is its skip-if-file-exists shard memoization
(QueryAuthorBNF.java:60-66) and the per-URI N3 disk cache
(GraphHandlerNEL.java:351-384) — done properly here: an atomic manifest written
AFTER the data makes a half-written stage invisible to resume.

Storage backend: plain parquet checkpoints whose layout (hive `bucket=N`
partitions, JSON manifest with schema + per-partition lineage) is the
snapshot/metadata subset an Iceberg hadoop-catalog deployment would provide
natively (SURVEY.md §7 hazard 7); all reads/writes go through this module so a
deployment can swap the backend in one place.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_reden_manifest.json"


def _lineage_from_footers(out: Path) -> list[dict]:
    """Per-partition row counters read from parquet footers — zero Spark jobs.
    Buckets appear as hive-style `bucket=N` directories; unbucketed tables get
    one counter per file."""
    import pyarrow.parquet as pq

    counts: dict[str, int] = {}
    for f in sorted(out.rglob("*.parquet")):
        part = "all"
        for seg in f.relative_to(out).parts:
            if "=" in seg:
                part = seg.split("=", 1)[1]
                break
        else:
            part = f.stem.split("-")[1][:8] if "-" in f.stem else f.stem
        counts[part] = counts.get(part, 0) + pq.ParquetFile(str(f)).metadata.num_rows
    return [{"part": p, "rows": n} for p, n in sorted(counts.items())]


def write_stage(
    df: DataFrame,
    out_dir: str | Path,
    name: str,
    bucket_col: str | None = None,
    n_buckets: int = 32,
) -> dict:
    """Write a stage table + manifest. When bucket_col is given the table is laid
    out by pmod(xxhash64(col), n_buckets) — the partition scheme a 100 TB run
    would use so downstream conv_id joins/groupBys read co-located buckets."""
    out = Path(out_dir) / name
    writer_df = df
    partition_by = None
    if bucket_col is not None:
        if "bucket" in df.columns:
            raise ValueError(
                f"stage '{name}': bucketed write would clobber an existing 'bucket' column"
            )
        writer_df = df.withColumn("bucket", F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets)).cast("int"))
        # co-locate each bucket into one task before the hive-partitioned write:
        # one file per bucket dir instead of (tasks x buckets) small files
        writer_df = writer_df.repartition(n_buckets, F.col("bucket"))
        partition_by = ["bucket"]
    # zstd: ~35% smaller stage files than snappy; compression CPU is parallel
    # across tasks while sink bandwidth is the scarce resource
    w = writer_df.write.mode("overwrite").option("compression", "zstd")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(str(out))

    lineage = _lineage_from_footers(out)
    manifest = {
        "stage": name,
        "rows": sum(p["rows"] for p in lineage),  # footer metadata: no extra Spark job
        "schema": df.schema.jsonValue(),
        "lineage": lineage,
        "written_at": time.time(),
        "format": "parquet",
        "bucketed": bucket_col is not None,
    }
    # atomic: a crash mid-write must not leave a parseable-looking manifest
    # that stage_exists() would treat as a complete checkpoint forever
    tmp = out / (MANIFEST + ".tmp")
    tmp.write_text(json.dumps(manifest))
    os.replace(tmp, out / MANIFEST)
    return manifest


def stage_exists(out_dir: str | Path, name: str) -> bool:
    return (Path(out_dir) / name / MANIFEST).exists()


def read_stage(spark: SparkSession, out_dir: str | Path, name: str) -> DataFrame:
    df = spark.read.parquet(str(Path(out_dir) / name))
    # drop the synthetic partition column only when THIS module added it —
    # a stage whose data legitimately contains a 'bucket' column keeps it
    if "bucket" in df.columns:
        try:
            # default True when the key is MISSING: pre-flag manifests never
            # recorded 'bucketed', and under them only bucketed stages carried
            # the synthetic column. False only when a manifest explicitly
            # recorded an unbucketed write (user data owns the column).
            bucketed = bool(read_manifest(out_dir, name).get("bucketed", True))
        except (OSError, json.JSONDecodeError):
            bucketed = True
        if bucketed:
            df = df.drop("bucket")
    return df


def read_manifest(out_dir: str | Path, name: str) -> dict:
    return json.loads((Path(out_dir) / name / MANIFEST).read_text())


def invalidate_from(out_dir: str | Path, names: list[str]) -> None:
    """Drop manifests of the given stages so resume recomputes them."""
    for n in names:
        m = Path(out_dir) / n / MANIFEST
        if m.exists():
            m.unlink()
