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


_BUCKET_FILE_RE = None


def _lineage_from_footers(out: Path) -> list[dict]:
    """Per-partition row counters read from parquet footers — zero Spark jobs.
    Buckets appear as hive-style `bucket=N` directories or as the `_NNNNN`
    suffix of Spark bucketed-table files; unbucketed tables get one counter
    per file."""
    import re

    import pyarrow.parquet as pq

    global _BUCKET_FILE_RE
    if _BUCKET_FILE_RE is None:
        _BUCKET_FILE_RE = re.compile(r"_(\d{5})(?:\.c\d+)?$")

    counts: dict[str, int] = {}
    for f in sorted(out.rglob("*.parquet")):
        part = "all"
        for seg in f.relative_to(out).parts:
            if "=" in seg:
                part = seg.split("=", 1)[1]
                break
        else:
            m = _BUCKET_FILE_RE.search(f.stem.split(".")[0])
            if m:
                part = str(int(m.group(1)))  # Spark bucketed-table file suffix
            else:
                part = f.stem.split("-")[1][:8] if "-" in f.stem else f.stem
        counts[part] = counts.get(part, 0) + pq.ParquetFile(str(f)).metadata.num_rows
    return [{"part": p, "rows": n} for p, n in sorted(counts.items())]


def _ckpt_table_name(out_dir: str | Path, name: str) -> str:
    """Session-catalog identifier for a Spark-bucketed checkpoint table —
    unique per (out_dir, stage) so concurrent pipelines in one session never
    collide."""
    import hashlib
    import re

    h = hashlib.md5(str(Path(out_dir).resolve()).encode()).hexdigest()[:8]
    return f"reden_ckpt_{re.sub(r'[^A-Za-z0-9_]', '_', name)}_{h}"


def write_stage(
    df: DataFrame,
    out_dir: str | Path,
    name: str,
    bucket_col: str | None = None,
    n_buckets: int = 32,
    spark_bucket_col: str | None = None,
    pre_shuffle: bool = True,
    prebucketed: bool = False,
) -> dict:
    """Write a stage table + manifest. Three layouts:

    * ``bucket_col`` — hive-style ``bucket=N`` dirs keyed on
      pmod(xxhash64(col), n_buckets): the queryable-product layout (readers
      prune by directory). Costs one full shuffle of the stage output.
    * ``prebucketed`` — the caller already attached a ``bucket`` column AND
      arranged physical clustering (e.g. the frame inherits a bucketed scan's
      partitioning); same hive layout, ZERO shuffle — each task holds few
      distinct bucket values so the partitioned write stays at ~1 file/task.
    * ``spark_bucket_col`` — a Spark-native bucketed TABLE (`bucketBy` +
      `saveAsTable`, metadata re-registered from the manifest on read). The
      checkpoint layout for turn-grain stages: a later `read_stage` scan
      reports HashPartitioning(col, n_buckets), so downstream groupBys and
      joins whose keys contain `col` elide their Exchange entirely — stage
      boundaries REUSE the partitioning instead of re-shuffling (the round-2
      scaling bottleneck: 237+310 MB of turn-grain shuffle). ``pre_shuffle``
      repartitions to one-file-per-bucket first; pass False when the frame is
      already hash(col, n_buckets)-partitioned (the write is then
      shuffle-free — Spark's bucket id is pmod(Murmur3, n), exactly the
      partitioning an upstream bucketed join/scan produced).
    """
    out = Path(out_dir) / name
    writer_df = df
    partition_by = None
    if spark_bucket_col is not None:
        spark = df.sparkSession
        tname = _ckpt_table_name(out_dir, name)
        if pre_shuffle:
            writer_df = df.repartition(n_buckets, F.col(spark_bucket_col))
        spark.sql(f"DROP TABLE IF EXISTS {tname}")
        (
            writer_df.write.mode("overwrite")
            .option("compression", "zstd")
            .option("path", str(out))
            .bucketBy(n_buckets, spark_bucket_col)
            .saveAsTable(tname)
        )
    else:
        if bucket_col is not None:
            if "bucket" in df.columns:
                raise ValueError(
                    f"stage '{name}': bucketed write would clobber an existing 'bucket' column"
                )
            writer_df = df.withColumn(
                "bucket", F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets)).cast("int")
            )
            # co-locate each bucket into one task before the hive-partitioned
            # write: one file per bucket dir instead of (tasks x buckets) files
            writer_df = writer_df.repartition(n_buckets, F.col("bucket"))
            partition_by = ["bucket"]
        elif prebucketed:
            if "bucket" not in df.columns:
                raise ValueError(f"stage '{name}': prebucketed write needs a 'bucket' column")
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
        "bucketed": bucket_col is not None or prebucketed,
    }
    if spark_bucket_col is not None:
        manifest["spark_bucketed"] = {"col": spark_bucket_col, "n": n_buckets}
    # atomic: a crash mid-write must not leave a parseable-looking manifest
    # that stage_exists() would treat as a complete checkpoint forever
    tmp = out / (MANIFEST + ".tmp")
    tmp.write_text(json.dumps(manifest))
    os.replace(tmp, out / MANIFEST)
    return manifest


def stage_exists(out_dir: str | Path, name: str) -> bool:
    return (Path(out_dir) / name / MANIFEST).exists()


def read_stage(spark: SparkSession, out_dir: str | Path, name: str) -> DataFrame:
    try:
        sb = read_manifest(out_dir, name).get("spark_bucketed")
    except (OSError, json.JSONDecodeError):
        sb = None
    if sb:
        # Re-register the bucketed table from the manifest (the in-memory
        # session catalog does not survive restarts — resume runs recreate the
        # metadata over the existing files) and scan THROUGH the catalog so the
        # plan carries HashPartitioning(col, n): downstream ops keyed on the
        # bucket column skip their Exchange.
        from pyspark.sql.types import StructType

        tname = _ckpt_table_name(out_dir, name)
        schema = StructType.fromJson(read_manifest(out_dir, name)["schema"])
        cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
        spark.sql(f"DROP TABLE IF EXISTS {tname}")
        spark.sql(
            f"CREATE TABLE {tname} ({cols}) USING parquet "
            f"CLUSTERED BY ({sb['col']}) INTO {sb['n']} BUCKETS "
            f"LOCATION '{Path(out_dir).resolve() / name}'"
        )
        return spark.table(tname)
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
