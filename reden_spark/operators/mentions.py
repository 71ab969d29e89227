"""Stage 1 — mention detection over transcript text.

Replaces the reference's XPath tag scan (MainNELApp.java:233-241, where mentions
arrive pre-annotated in TEI): here we detect every known surface form (dictionary
aliases + annotatable NIL terms) in raw turn text.

Two implementations with identical output on non-repeating text:

* :func:`detect_mentions` — the production path: an Arrow-batched pandas UDF
  running a compiled leftmost-longest gazetteer regex per text batch. The term
  list is shipped once per executor via a Spark broadcast; the compiled matcher
  is cached per worker process. Scales: embarrassingly parallel per turn, no
  shuffle until the occurrence-index window.

* :func:`detect_mentions_relational` — pure DataFrame ops (broadcast join +
  boundary predicates + maximality anti-join). Used for DuckDB oracle parity;
  restriction: detects at most one occurrence of a given term per turn (first
  position), so it matches the UDF path only when no term repeats within a turn.

occ_idx = dense per (conv_id, turn_idx), ordered by start position — this is the
stable ordering key for the positional gold join
(ResultsAndEvaluationNEL.java:240-258) and the north-rule (conv_id, turn_idx)
ordering invariant.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType, StructField, StructType

from ..functions.gazetteer import GazetteerMatcher

_MATCH_TYPE = ArrayType(
    StructType(
        [
            StructField("mention", StringType()),
            StructField("start_pos", IntegerType()),
        ]
    )
)

# per-worker matcher cache: broadcast identity -> compiled matcher
_MATCHER_CACHE: dict[object, GazetteerMatcher] = {}


def broadcast_terms(terms: DataFrame):
    """Ship the distinct term list to executors as an Arrow IPC buffer.

    The driver never materializes Python row objects (round 1 used
    ``.collect()`` — a driver bottleneck at real gazetteer scale, 10^7 BnF/
    Geonames aliases): ``toArrow()`` pulls the columnar batch straight from the
    JVM, it is serialized once as IPC bytes, and Spark's torrent broadcast
    distributes it. Workers decode the buffer and compile the matcher once per
    process (see :func:`_matcher_for`). Beyond what a single broadcast
    comfortably holds (~GB), swap this for a shared-storage path handed to the
    workers — the decode path below already isolates that choice."""
    import pyarrow as pa

    tbl = terms.select("term").distinct().toArrow()
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, tbl.schema) as writer:
        writer.write_table(tbl)
    return terms.sparkSession.sparkContext.broadcast(sink.getvalue().to_pybytes())


def file_terms_handle(terms: DataFrame, path: str) -> dict:
    """The >GB escape hatch of :func:`broadcast_terms`: write the distinct term
    list as parquet at a worker-reachable `path` (a DISTRIBUTED write — the
    terms never pass through the driver at all, unlike the broadcast, whose
    payload the driver must at least relay once) and return the tiny handle
    that is broadcast in its place. Each worker process opens the file and
    compiles the matcher once (cached in _MATCHER_CACHE keyed by path PLUS a
    content fingerprint of the written files: rewriting the same path with a
    different term list — mode('overwrite') permits it — must not serve a
    stale compiled matcher from a long-lived worker process). On a cluster
    `path` lives on the DFS every executor mounts; torrent-broadcast bandwidth
    stops being the bottleneck at 10^7-alias gazetteers."""
    terms.select("term").distinct().write.mode("overwrite").parquet(path)
    return {"terms_path": path, "fingerprint": _terms_fingerprint(path)}


def _terms_fingerprint(path: str) -> str | None:
    """Digest of (name, size, mtime) of the parquet files under `path`; None
    when the path is not locally statable (e.g. a DFS URI, where rglob simply
    yields nothing rather than raising — a digest-of-nothing would be the
    SAME constant for every remote path and defeat the cache key; on a DFS
    the writer should hand out a fresh path per gazetteer version instead)."""
    import hashlib
    from pathlib import Path as _P

    try:
        h = hashlib.md5()
        n = 0
        for f in sorted(_P(path).rglob("*.parquet")):
            st = f.stat()
            h.update(f"{f.name}:{st.st_size}:{st.st_mtime_ns};".encode())
            n += 1
        return h.hexdigest() if n else None
    except OSError:
        return None


def _matcher_for(bc) -> GazetteerMatcher:
    # worker-side Broadcast exposes _path (spill file); driver-side has _jbroadcast.
    value_is_handle = isinstance(getattr(bc, "value", None), dict)
    key = (
        (bc.value["terms_path"], bc.value.get("fingerprint"))
        if value_is_handle
        else (getattr(bc, "_path", None) or id(bc))
    )
    matcher = _MATCHER_CACHE.get(key)
    if matcher is None:
        value = bc.value
        if isinstance(value, dict):  # file handle (file_terms_handle)
            import pyarrow.parquet as pq

            terms = pq.read_table(value["terms_path"], columns=["term"]).column("term").to_pylist()
        elif isinstance(value, (bytes, bytearray)):
            import pyarrow as pa

            terms = pa.ipc.open_stream(pa.BufferReader(value)).read_all().column("term").to_pylist()
        else:  # legacy plain-list broadcasts (streaming tests, ad-hoc callers)
            terms = value
        matcher = GazetteerMatcher(terms)
        _MATCHER_CACHE.clear()  # keep at most one compiled gazetteer per worker
        _MATCHER_CACHE[key] = matcher
    return matcher


def mention_finder_udf(terms: DataFrame, terms_path: str | None = None):
    """Build the Arrow-batched gazetteer UDF (shared by batch and streaming paths).
    The term list ships once per executor via an Arrow broadcast — or, when
    ``terms_path`` is given, via shared storage (:func:`file_terms_handle`, the
    >GB gazetteer path); the compiled regex is cached per worker process."""
    if terms_path is not None:
        bc = terms.sparkSession.sparkContext.broadcast(file_terms_handle(terms, terms_path))
    else:
        bc = broadcast_terms(terms)

    @F.pandas_udf(_MATCH_TYPE)
    def find_all(texts: pd.Series) -> pd.Series:
        matcher = _matcher_for(bc)
        return texts.map(lambda t: [{"mention": m, "start_pos": s} for m, s in matcher.find(t or "")])

    return find_all


_MENTIONS_SCHEMA = "conv_id string, turn_idx int, occ_idx int, mention string, start_pos int"


def detect_mentions(turns: DataFrame, terms: DataFrame, terms_path: str | None = None) -> DataFrame:
    """transcripts x mention_terms -> MENTIONS schema (production mapInPandas path).

    Map-only: the matcher emits matches in left-to-right order, so occ_idx is
    just the per-turn match index — no window shuffle. mapInPandas emits the
    exploded flat rows directly from the Arrow batch (columnar list building),
    skipping the nested array<struct> construction + JVM posexplode a scalar
    UDF would need — ~2x less Python/Arrow overhead per turn.

    ``terms_path``: shared-storage gazetteer handoff for dictionaries too big
    to broadcast comfortably (:func:`file_terms_handle`).
    """
    import numpy as np

    if terms_path is not None:
        bc = turns.sparkSession.sparkContext.broadcast(file_terms_handle(terms, terms_path))
    else:
        bc = broadcast_terms(terms)

    def gen(batches):
        matcher = _matcher_for(bc)
        for pdf in batches:
            # one finditer pass over the NUL-joined batch buffer + vectorized
            # numpy row/offset/occ_idx assembly, instead of a Python find()
            # call and 5 list appends per row/match (the profiled residual of
            # the round-4 kernel — VERDICT r4 task #6). Output rows and order
            # are identical to the per-row loop (pinned by the oracle tests).
            rows, occ, ments, starts = matcher.find_batch(pdf["text"].tolist())
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].values[rows],
                    "turn_idx": pdf["turn_idx"].values[rows].astype(np.int32),
                    "occ_idx": occ,
                    "mention": ments,
                    "start_pos": starts,
                }
            )

    return turns.select("conv_id", "turn_idx", "text").mapInPandas(gen, _MENTIONS_SCHEMA)


def detect_mentions_relational(turns: DataFrame, terms: DataFrame) -> DataFrame:
    """DataFrame-only detector (broadcast join; first occurrence per term/turn).

    Maximality: a match strictly contained in a longer match's span is dropped
    (mirrors leftmost-longest). Word boundary: the chars adjacent to the match
    must not be word chars ((?U): Unicode word chars, like the UDF twin's
    Python \\w — accented letters count).

    Contract vs the UDF twin: identical output when each term occurs at most
    once per turn (instr finds only the FIRST substring position, so a term
    whose first occurrence fails the boundary check contributes nothing for
    that turn even if a later occurrence would match — e.g. 'Balzacé ... Balzac'
    yields the standalone Balzac in the UDF path only). The UDF path is the
    production detector; this twin exists as an all-relational cross-check.
    """
    t = terms.select(F.col("term")).distinct()
    cand = (
        turns.select("conv_id", "turn_idx", "text")
        .join(F.broadcast(t), F.instr("text", F.col("term")) > 0)
        .withColumn("start_pos", (F.instr("text", F.col("term")) - 1).cast("int"))
        .withColumn("end_pos", F.col("start_pos") + F.length("term"))
        # boundary chars (substring is 1-based; out-of-range yields ''; pos=0 would
        # be coerced to 1, so guard the string-start case explicitly)
        .withColumn(
            "pre",
            F.when(F.col("start_pos") == 0, F.lit("")).otherwise(
                F.substring(F.col("text"), F.col("start_pos"), F.lit(1))
            ),
        )
        .withColumn("post", F.substring(F.col("text"), F.col("end_pos") + 1, F.lit(1)))
        # (?U): Java \w is ASCII-only, but the UDF twin's Python \w is Unicode —
        # without the flag 'Balzacé' would boundary-match 'Balzac' here and not
        # there (accented French letters must count as word chars in BOTH paths)
        .filter(~F.col("pre").rlike(r"(?U)\w") & ~F.col("post").rlike(r"(?U)\w"))
        .select("conv_id", "turn_idx", F.col("term").alias("mention"), "start_pos", "end_pos")
    )
    inner = cand.alias("a").join(
        cand.alias("b"),
        (F.col("a.conv_id") == F.col("b.conv_id"))
        & (F.col("a.turn_idx") == F.col("b.turn_idx"))
        & (F.col("a.mention") != F.col("b.mention"))
        & (F.col("a.start_pos") >= F.col("b.start_pos"))
        & (F.col("a.end_pos") <= F.col("b.end_pos")),
        "left_anti",
    )
    w = Window.partitionBy("conv_id", "turn_idx").orderBy("start_pos")
    return (
        inner.withColumn("occ_idx", (F.row_number().over(w) - F.lit(1)).cast("int"))
        .select("conv_id", "turn_idx", "occ_idx", "mention", "start_pos")
    )
