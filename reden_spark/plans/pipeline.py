"""The five-stage checkpointed KG-construction pipeline (SURVEY.md §7).

    transcripts -> mentions -> candidates -> links -> triples -> metrics

Each stage reads the previous stage's checkpoint and writes its own (parquet/
Iceberg via sources.storage) with per-partition lineage counters; `--from-stage`
(or a missing/invalidated manifest) recomputes from that point — the north rule's
resumability contract. Launchable via spark-submit --py-files as

    spark-submit --py-files dist/reden_spark.zip reden_spark/plans/pipeline.py \
        --data-dir /root/testdata/... --out-dir /tmp/kg_out

(or `python -m reden_spark.plans.pipeline ...` locally — the module runs both
as a package member and as a bare script path).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# absolute imports + bootstrap so the module works BOTH as a package member
# and as a bare script path handed to spark-submit (which runs the file as
# __main__ with no parent package — relative imports would raise ImportError
# before main() ever ran)
if __package__ in (None, ""):
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from reden_spark.operators.candidates import conversation_cases, generate_candidates  # noqa: E402
from reden_spark.operators.canonicalize import materialize_triples  # noqa: E402
from reden_spark.operators.disambiguate import NELConfig, disambiguate  # noqa: E402
from reden_spark.operators.evaluate import eval_records, hachey_metrics  # noqa: E402
from reden_spark.operators.mentions import detect_mentions  # noqa: E402
from reden_spark.sources import storage  # noqa: E402

STAGES = ["mentions", "candidates", "links", "triples", "metrics"]


def run_pipeline(
    spark: SparkSession,
    data_dir: str | Path,
    out_dir: str | Path,
    cfg: NELConfig,
    from_stage: str | None = None,
    use_grouped: bool = False,
    n_buckets: int = 32,
    checkpoint_mode: str | None = None,
    layout: str = "bucketed",
) -> dict[str, DataFrame]:
    """Run (or resume) the pipeline; returns the stage DataFrames.

    ``layout``: 'bucketed' (default) checkpoints turn-grain stages as
    conv_id-bucketed Spark tables so stage boundaries reuse partitioning
    (see the stage comments below); 'plain' is the round-2 layout (flat
    parquet checkpoints, triples bucketed by a full xxhash(subj) shuffle) —
    kept for A/B benchmarking on a noisy shared host, where only an
    interleaved comparison under identical co-tenant load is meaningful.

    ``checkpoint_mode``: local|reliable|persist (checkpointing.py). 'reliable'
    routes the intra-stage shared-subtree materializations through
    fault-tolerant `df.checkpoint` — the multi-executor-cluster setting, where
    a lost executor must not truncate lineage mid-stage. When no checkpoint
    dir is configured yet, one is created under <out_dir>/.spark_checkpoints
    (point spark.sparkContext.setCheckpointDir at DFS storage on a real
    cluster before calling for a different location)."""
    data = Path(data_dir)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    if checkpoint_mode is not None:
        from reden_spark.checkpointing import set_checkpoint_mode

        set_checkpoint_mode(checkpoint_mode)
        if checkpoint_mode == "reliable" and spark.sparkContext._jsc.sc().checkpointDir().isEmpty():
            spark.sparkContext.setCheckpointDir(str(out / ".spark_checkpoints"))

    def src(name: str) -> DataFrame:
        # An input table shipped with a storage manifest (e.g. transcripts
        # rewritten as a conv_id-bucketed table — the parquet stand-in for an
        # Iceberg bucket(conv_id) partition transform at ingest) is read
        # through the catalog so its partitioning reaches the planner.
        if storage.stage_exists(data, f"{name}.parquet"):
            return storage.read_stage(spark, data, f"{name}.parquet")
        return spark.read.parquet(str(data / f"{name}.parquet"))

    def src_bucketing(name: str) -> dict | None:
        if storage.stage_exists(data, f"{name}.parquet"):
            return storage.read_manifest(data, f"{name}.parquet").get("spark_bucketed")
        return None

    if from_stage is not None:
        idx = STAGES.index(from_stage)
        storage.invalidate_from(out, STAGES[idx:])

    timings: dict[str, float] = {}

    def stage(name: str, compute, bucket_col: str | None, **layout):
        if storage.stage_exists(out, name):
            return storage.read_stage(spark, out, name)
        # job-group tag: Spark stages/tasks of this pipeline stage are
        # attributable in the event log / UI (per-stage shuffle-byte and CPU
        # accounting — see bench.py --stage-profile)
        spark.sparkContext.setJobGroup(f"reden-{name}", f"pipeline stage {name}")
        t0 = time.time()
        try:
            df = compute()
            storage.write_stage(df, out, name, bucket_col=bucket_col, n_buckets=n_buckets, **layout)
        finally:
            spark.sparkContext.setJobGroup("", "")
        timings[name] = time.time() - t0
        return storage.read_stage(spark, out, name)

    # Detection is per-turn, so input splits (parquet row groups) spread a
    # mega-conversation's turns across every task with NO up-front shuffle —
    # this is the salt step of SURVEY.md §4's salt/un-salt dance for free:
    # conversation grouping only happens later via shuffle keys (with AQE skew
    # handling), so no single task ever holds a whole conversation. Guard the
    # degenerate case: a producer that wrote one giant row group would run the
    # dominant map stage on a single task, so repartition ONLY when the scan
    # yields fewer splits than the session's parallelism.
    # Parallelism guard without a shuffle: aim maxPartitionBytes at
    # size/parallelism so the scan itself yields >= defaultParallelism splits
    # (Spark's bytes-per-core heuristic stops helping once openCostInBytes
    # floors the split size — observed: a 40 MB input at local[32] planned 10
    # splits, and the old repartition() fallback then shuffled the whole input,
    # 60 MB of traffic before the first map stage). Splits are only real up to
    # row-group granularity, so the shuffle fallback remains for the degenerate
    # producer that wrote one giant row group.
    min_parallelism = spark.sparkContext.defaultParallelism
    tfiles = sorted(Path(data).glob("transcripts.parquet/*.parquet")) or [
        data / "transcripts.parquet"
    ]
    prev_split = None
    split_overridden = False
    try:
        import pyarrow.parquet as pq

        total_bytes = sum(f.stat().st_size for f in tfiles if f.is_file())
        n_row_groups = sum(
            pq.ParquetFile(str(f)).metadata.num_row_groups for f in tfiles if f.is_file()
        )
        # 3 waves, not 1: detection cost varies per turn (text length), so a
        # one-wave layout rides its slowest task — 3x finer splits cut the
        # XL-corpus mentions wall 32.8 -> 22.3 s at local[8] (straggler tail
        # absorbed; per-task overhead is amortized by reused python workers)
        split = max(1 << 20, min(128 << 20, total_bytes // (min_parallelism * 3) or 1))
        prev_split = spark.conf.get("spark.sql.files.maxPartitionBytes", None)
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
        split_overridden = True
    except Exception:
        n_row_groups = 0
    # The override stays in force for the whole pipeline run — the stage
    # checkpoints it sizes are written at the same data scale as transcripts —
    # and is restored on exit so reads on the shared session afterward
    # (arbitrarily larger or smaller tables) plan splits from their own default.
    try:
        transcripts = src("transcripts")
        in_bucketing = src_bucketing("transcripts")
        if in_bucketing is None and (
            n_row_groups < min_parallelism
            and transcripts.rdd.getNumPartitions() < min_parallelism
        ):
            transcripts = transcripts.repartition(min_parallelism)
        terms = src("mention_terms")
        dico = src("dico")
        kb_edges = src("kb_edges")
        rel_weights = src("rel_weights")

        # Turn-grain checkpoints (mentions, candidates, links) are Spark-native
        # BUCKETED TABLES on conv_id (storage.write_stage spark_bucket_col):
        # their scans report HashPartitioning(conv_id, n_buckets), so every
        # downstream distinct/groupBy/join whose keys contain conv_id reuses
        # the stage boundary's partitioning instead of re-shuffling — the
        # round-2 profile's 237 MB links-stage and 310 MB triples-stage
        # turn-grain shuffles collapse to the small (conversation-grain) join
        # sides. Cost: ONE compact shuffle at the mentions write (the rows the
        # links stage used to shuffle twice); candidates and links inherit the
        # partitioning through narrow ops, so their bucketed writes are
        # shuffle-free (pre_shuffle=False). This is the parquet+session-catalog
        # restatement of what an Iceberg bucket(conv_id) partition transform
        # provides natively. Trade-offs at 100 TB: scan parallelism of a
        # bucketed read is one task per bucket (raise n_buckets with the
        # cluster), and a skewed conversation stays in one bucket task (the
        # join is linear per conversation; AQE skew-split does not apply to the
        # unshuffled side — documented in BENCH.md).
        # When the INPUT transcripts table is itself bucketed on conv_id (the
        # production Iceberg layout: bucket(conv_id) applied at ingest, paid
        # once per corpus rather than once per run), detection — a pure map —
        # inherits the partitioning and the mentions checkpoint write is
        # completely shuffle-free; the bucket count follows the input's.
        # Unbucketed inputs (the driver's raw testdata) pay one compact
        # repartition here instead — still strictly less movement than the
        # round-2 layout, which re-shuffled the same rows in the links stage.
        if in_bucketing is not None and in_bucketing.get("col") == "conv_id":
            mentions_layout = {"pre_shuffle": False}
            n_buckets = int(in_bucketing["n"])
        else:
            mentions_layout = {"pre_shuffle": True}
        ckpt_bucketing = {"spark_bucket_col": "conv_id"} if layout == "bucketed" else {}
        mentions = stage(
            "mentions",
            lambda: detect_mentions(transcripts, terms),
            None,
            **(ckpt_bucketing | mentions_layout if ckpt_bucketing else {}),
        )
        candidates = stage(
            "candidates",
            lambda: generate_candidates(mentions, dico),
            None,
            **(ckpt_bucketing | {"pre_shuffle": False} if ckpt_bucketing else {}),
        )

        def compute_links() -> DataFrame:
            cases = conversation_cases(mentions, candidates)
            if use_grouped:
                from reden_spark.operators.grouped import disambiguate_grouped

                return disambiguate_grouped(mentions, candidates, kb_edges, rel_weights, cases, cfg)
            return disambiguate(mentions, candidates, kb_edges, rel_weights, cases, cfg)

        links = stage(
            "links",
            compute_links,
            None,
            **(ckpt_bucketing | {"pre_shuffle": False} if ckpt_bucketing else {}),
        )
        # The product table keeps the hive bucket=N layout (north rule:
        # partitioned output readers can prune), but the bucket ids come from
        # materialize_triples(bucket_into=...): mention triples land in their
        # conversation's links-checkpoint bucket (zero shuffle), entity
        # passthrough triples hash on subj (small repartition).
        if layout == "bucketed":
            triples = stage(
                "triples",
                lambda: materialize_triples(
                    links,
                    kb_edges,
                    dico,
                    cfg.sameas_pred,
                    broadcast_uri_map=cfg.broadcast_uri_map,
                    bucket_into=n_buckets,
                ),
                None,
                prebucketed=True,
            )
        else:
            triples = stage(
                "triples",
                lambda: materialize_triples(
                    links, kb_edges, dico, cfg.sameas_pred, broadcast_uri_map=cfg.broadcast_uri_map
                ),
                "subj",
            )

        result = {
            "mentions": mentions,
            "candidates": candidates,
            "links": links,
            "triples": triples,
        }

        gold_path = data / "gold_links.parquet"
        if gold_path.exists():
            def compute_metrics() -> DataFrame:
                records = eval_records(spark.read.parquet(str(gold_path)), links, candidates)
                return hachey_metrics(records)

            result["metrics"] = stage("metrics", compute_metrics, None)
    finally:
        # restore even when the session had no explicit prior value (conf.get
        # with a fallback bypasses the registered SQL default) — unset then
        if split_overridden:
            if prev_split is not None:
                spark.conf.set("spark.sql.files.maxPartitionBytes", prev_split)
            else:
                spark.conf.unset("spark.sql.files.maxPartitionBytes")

    if timings:
        (out / "_timings.json").write_text(json.dumps(timings))
    return result


def main() -> None:
    import os
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    from reden_spark.datagen import BASE_PREFIX
    from reden_spark.session import get_spark

    ap = argparse.ArgumentParser(description="REDEN-on-Spark KG construction pipeline")
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--from-stage", choices=STAGES)
    ap.add_argument("--grouped", action="store_true", help="use the applyInPandas stage-3 variant")
    ap.add_argument("--master", default=None)
    ap.add_argument("--base-prefix", default=BASE_PREFIX)
    ap.add_argument("--preferred-uri", default=BASE_PREFIX, help="preferedURIOrder prefix or 'ALL'")
    ap.add_argument(
        "--centrality",
        default="DegreeCentrality",
        choices=[
            "DegreeCentrality",
            "EigenvectorCentrality",
            "BrandesBetweennessCentrality",
            "FreemanClosenessCentrality",
        ],
        help="centralityMeasure (CentralityHandler.java:137-152); Brandes/Freeman require --grouped",
    )
    ap.add_argument(
        "--crawl-sameas",
        default="ALL",
        help="restrict sameAs expansion to objects with this prefix (GraphHandlerNEL.java:143-167)",
    )
    ap.add_argument(
        "--properties",
        default=None,
        help="reference-shaped config.properties file (MainNELApp.java:105-123); "
        "maps the 16 keys onto NELConfig, logs dropped knobs; explicit CLI flags win",
    )
    ap.add_argument(
        "--checkpoint-mode",
        choices=["local", "reliable", "persist"],
        default=None,
        help="intra-stage materialization mode (checkpointing.py): local blocks (default), "
        "fault-tolerant df.checkpoint (multi-executor clusters), or lineage-keeping persist",
    )
    ap.add_argument(
        "--no-broadcast-uri-map",
        action="store_true",
        help="let AQE size the triple-canonicalization join instead of forcing a broadcast "
        "(for KBs whose distinct chosen-URI combinations outgrow an executor)",
    )
    a = ap.parse_args()

    spark = get_spark("reden-pipeline", master=a.master or os.environ.get("SPARK_MASTER"))
    if a.properties:
        from dataclasses import replace

        from reden_spark.plans.properties import nel_config_from_properties

        cfg, extras, dropped = nel_config_from_properties(a.properties)
        for key, reason in sorted(dropped.items()):
            print(f"properties: dropping '{key}' — {reason}")
        cfg = replace(cfg, broadcast_uri_map=not a.no_broadcast_uri_map)
        # explicit (non-default) CLI flags win over file values
        cli = {
            "base_prefix": (a.base_prefix, BASE_PREFIX),
            "preferred_uri": (a.preferred_uri, BASE_PREFIX),
            "centrality": (a.centrality, "DegreeCentrality"),
            "crawl_sameas": (a.crawl_sameas, "ALL"),
        }
        for field, (arg_val, default) in cli.items():
            if arg_val != default:
                cfg = replace(cfg, **{field: arg_val})
    else:
        cfg = NELConfig(
            base_prefix=a.base_prefix,
            preferred_uri=a.preferred_uri,
            centrality=a.centrality,
            crawl_sameas=a.crawl_sameas,
            broadcast_uri_map=not a.no_broadcast_uri_map,
        )
    t0 = time.time()
    dfs = run_pipeline(
        spark, a.data_dir, a.out_dir, cfg, a.from_stage, a.grouped, checkpoint_mode=a.checkpoint_mode
    )
    n_links = dfs["links"].count()
    n_triples = dfs["triples"].count()
    print(json.dumps({"elapsed_sec": time.time() - t0, "links": n_links, "triples": n_triples}))


if __name__ == "__main__":
    main()
