"""SparkSession factory tuned for the KG-construction pipeline.

Defaults chosen for scale (AQE on, Arrow on, skew-join handling on); shuffle
partition count is sized for the sandbox but is the knob a real cluster would
raise to O(cores * 2-3).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _scratch_dir() -> str:
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/spark_scratch"
        os.makedirs(d, exist_ok=True)
        return d
    return "/tmp"


def get_spark(
    app_name: str = "reden-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so bench
    runs can flip parallelism with one env var / argument.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # Fixed default (not tied to the master's core count): the physical plan
        # must be identical across parallelism levels for the N->4N scaling
        # experiment to measure scheduling, not plan drift. 64 = 2x the largest
        # local[] size used here; a real cluster raises it to 2-3x total cores.
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # shuffle/spill scratch: prefer memory-backed storage when present (the
        # single-node stand-in for a cluster's per-executor local NVMe; one
        # shared spinning disk would serialize every shuffle at any core count)
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", _scratch_dir()))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "32m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
