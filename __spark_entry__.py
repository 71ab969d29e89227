"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: the full KG-construction pipeline (mention detection ->
candidate join -> per-conversation graph disambiguation -> links) over a
transcripts table derived deterministically from sf0.001 events+nation.

queries()/oracle_sql() — one entry per implemented operator from SURVEY.md §2
plus the training-data extras (dedup family incl. transitive clustering and
the chained curation_pipeline recipe, ANN family, text stats incl. TF-IDF,
media decoders, stratified sampling); ALL 50 queries carry an exact DuckDB
oracle (see reden_spark/driver_contract.py) — no rows-only entries remain.
The contract is capped at 50 rows (the driver's per-round oracle budget)
and rows ROTATE between the driver window and the pytest window so every
query earns a driver CORRECTNESS artifact: round 5 swaps IN the 14 rows
that previously had only pytest evidence (PII redaction, quality gates,
repetition signals, BPE-pretokenizer counting, greedy packing, semantic
dedup clustering, IVF-PQ ANN, plus the 7 grouped/relational twins) AND the
9 operators added during round 5 (URL inventory, domain filter/cap,
deterministic shuffle, chunk windows, corpus n-gram top-k, bigram-LM
perplexity, duplicated-span coverage, entity PMI), swapping OUT 23 stable
rows driver-green in both r3 and r4, now pytest-pinned
(driver_contract.PYTEST_QUERIES, tests/test_driver_contract.py). With this
swap every one of the 73 rows has a driver CORRECTNESS entry in r1-r5.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from reden_spark.driver_contract import ORACLES, QUERIES, q_kg_links  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_kg_links(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
