"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: the full KG-construction pipeline (mention detection ->
candidate join -> per-conversation graph disambiguation -> links) over a
transcripts table derived deterministically from sf0.001 events+nation.

queries()/oracle_sql() — one entry per implemented operator from SURVEY.md §2
plus the training-data extras (dedup family incl. transitive clustering and
the chained curation_pipeline recipe, ANN family, text stats incl. TF-IDF,
media decoders, stratified sampling); ALL 50 queries carry an exact DuckDB
oracle (see reden_spark/driver_contract.py) — no rows-only entries remain.
The contract is capped at 50 rows (the driver's per-round oracle budget);
seven near-duplicate/derivative rows plus seven round-4 extras (PII
redaction, Gopher-style quality gates, boundary-respecting greedy packing,
SemDeDup-style semantic dedup clustering, IVF-PQ ANN, BPE-pretokenizer
counting, Gopher repetition signals)
are verified against the same kind of exact oracles by pytest instead
(driver_contract.PYTEST_QUERIES, tests/test_driver_contract.py).
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
