"""Structured-Streaming ingestion of transcript turns (SURVEY.md §2.6).

The reference is strictly batch (MainNELApp.java:184-199) and so is the north
rule; this module is the forward path for continuously-arriving transcripts:

    readStream(parquet dir) -> mention detection (same pandas UDF as batch)
      -> broadcast candidate join -> append sink (mentions/candidates tables)

plus a watermarked sliding-window mention-rate aggregate for monitoring. The
per-conversation graph stage stays batch (it needs the whole conversation; a
session_window + applyInPandasWithState variant is the eventual streaming shape
but conversations in the fixtures close quickly, so batch-over-checkpoint is the
honest design here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_transcripts(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.readStream.schema(schema).parquet(path)


def stream_mentions(turns_stream: DataFrame, terms: DataFrame) -> DataFrame:
    """Streaming mention detection — identical operator, streaming plan.
    (detect_mentions' occ_idx window is batch-only, so the stream emits
    (conv_id, turn_idx, mention, start_pos); occ_idx is assigned at compaction.)
    """
    from ..operators.mentions import mention_finder_udf

    find_all = mention_finder_udf(terms)
    return turns_stream.select(
        "conv_id", "turn_idx", "ts", F.explode(find_all(F.col("text"))).alias("m")
    ).select("conv_id", "turn_idx", "ts", F.col("m.mention").alias("mention"), F.col("m.start_pos").alias("start_pos"))


def stream_candidates(mentions_stream: DataFrame, dico: DataFrame) -> DataFrame:
    """Streaming candidate generation: stream-static broadcast join on
    alias_norm, BATCH-faithful — inner join (no phantom uris=NULL rows) with
    the same dico-side deterministic group_idx window as
    `generate_candidates` (oracle divergence D1), occurrence grain preserved
    (start_pos kept so compaction can assign occ_idx and distinguish repeated
    mentions in one turn)."""
    from pyspark.sql import Window

    from ..functions.text import normalize_mention

    wd = Window.partitionBy("alias_norm").orderBy("uris")
    d = F.broadcast(
        dico.select("alias_norm", "uris")
        .distinct()
        .withColumn("group_idx", (F.row_number().over(wd) - 1).cast("int"))
    )
    return (
        mentions_stream.withColumn("alias_norm", normalize_mention("mention"))
        .join(d, "alias_norm", "inner")
        .select("conv_id", "turn_idx", "ts", "mention", "start_pos", "group_idx", "uris")
    )


def mention_rate(mentions_stream: DataFrame, window: str = "10 minutes", slide: str = "5 minutes") -> DataFrame:
    """Watermarked windowed mention counts (late data tolerated up to 1 hour)."""
    return (
        mentions_stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", window, slide), F.col("mention"))
        .count()
    )


PROGRESS_OUT_SCHEMA = (
    "conv_id string, n_mentions bigint, n_turns bigint, max_turn_idx int, closed boolean"
)
PROGRESS_STATE_SCHEMA = "n_mentions bigint, n_turns bigint, max_turn_idx int"


def conversation_progress(
    mentions_stream: DataFrame, timeout_ms: int = 0
) -> DataFrame:
    """Custom stateful streaming operator (`applyInPandasWithState`): running
    per-conversation mention/turn counters. State is 3 ints per live
    conversation — bounded at 10^12-turn scale when eviction is on.

    ``timeout_ms=0`` (default) uses ``NoTimeout``: state lives for the run.
    This is the right mode for ``Trigger.AvailableNow`` drains — a
    processing-time timeout re-arms on every micro-batch, so AvailableNow
    keeps scheduling empty timeout batches and never terminates (observed
    ~1 batch/s forever; round-1 gate failure).

    ``timeout_ms>0`` uses ``ProcessingTimeTimeout``: idle conversations are
    closed and their state evicted; `closed=true` rows are the final tallies.
    Use only with a continuous trigger and explicit `stop()` — never with
    AvailableNow."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key: tuple, pdfs, state: GroupState):
        conv_id = key[0]
        if state.hasTimedOut:
            n_m, n_t, mx = state.get
            state.remove()
            yield pd.DataFrame(
                [{"conv_id": conv_id, "n_mentions": n_m, "n_turns": n_t, "max_turn_idx": mx, "closed": True}]
            )
            return
        n_m, n_t, mx = state.get if state.exists else (0, 0, -1)
        # Collect distinct turn_idx across ALL pandas chunks of this batch
        # (one group can span several Arrow chunks; per-chunk nunique would
        # double-count a turn straddling a chunk boundary). Bounded by the
        # batch's live turns, not total history. A turn straddling
        # *micro-batches* still counts once per batch (monitoring-grade).
        batch_turns: set = set()
        for pdf in pdfs:
            n_m += len(pdf)
            batch_turns.update(pdf["turn_idx"].tolist())
        if batch_turns:
            n_t += len(batch_turns)
            mx = max(mx, max(batch_turns))
        state.update((n_m, n_t, mx))
        if timeout_ms > 0:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            [{"conv_id": conv_id, "n_mentions": n_m, "n_turns": n_t, "max_turn_idx": mx, "closed": False}]
        )

    conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return mentions_stream.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType=PROGRESS_OUT_SCHEMA,
        stateStructType=PROGRESS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )


EVENT_STATE_SCHEMA = "n_mentions bigint, n_turns bigint, max_turn_idx int, last_ts_ms bigint"


def conversation_progress_event_time(
    mentions_stream: DataFrame, gap_ms: int = 30 * 60 * 1000
) -> DataFrame:
    """Watermark-driven conversation closing (`EventTimeTimeout`): a
    conversation with no mention for `gap` of EVENT time is closed and its
    state evicted. Late-data-safe (a replayed backlog closes the same
    conversations regardless of wall-clock speed — ProcessingTimeTimeout
    would close everything or nothing) and AvailableNow-safe: event-time
    timeouts only fire while the watermark advances, so a drained stream
    stops scheduling batches instead of re-arming forever (the round-1 hang).

    The watermark delay is derived from `gap_ms` (one knob — they cannot
    desynchronize). State per live conversation: 3 counters + last event time
    (bounded at 10^12-turn scale by the eviction)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap = f"{gap_ms} milliseconds"
    # applyInPandasWithState hands the UDF tz-NAIVE timestamps in the session
    # time zone, while getCurrentWatermarkMs/setTimeoutTimestamp speak UTC
    # epoch ms — capture the session tz at plan time and localize worker-side
    # (session.py pins UTC, but the operator must not depend on that)
    session_tz = mentions_stream.sparkSession.conf.get("spark.sql.session.timeZone")

    def update(key: tuple, pdfs, state: GroupState):
        conv_id = key[0]
        if state.hasTimedOut:
            n_m, n_t, mx, _last = state.get
            state.remove()
            yield pd.DataFrame(
                [{"conv_id": conv_id, "n_mentions": n_m, "n_turns": n_t, "max_turn_idx": mx, "closed": True}]
            )
            return
        n_m, n_t, mx, last_ms = state.get if state.exists else (0, 0, -1, 0)
        batch_turns: set = set()
        for pdf in pdfs:
            n_m += len(pdf)
            batch_turns.update(pdf["turn_idx"].tolist())
            ts_max = pdf["ts"].max()
            if pd.notna(ts_max):
                t = pd.Timestamp(ts_max)
                if t.tz is None:
                    t = t.tz_localize(session_tz)
                last_ms = max(last_ms, int(t.value // 1_000_000))
        if batch_turns:
            n_t += len(batch_turns)
            mx = max(mx, max(batch_turns))
        state.update((n_m, n_t, mx, last_ms))
        # fire when event time moves `gap` past this conversation's last
        # mention; the timestamp must sit above the current watermark
        state.setTimeoutTimestamp(max(last_ms + gap_ms, state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame(
            [{"conv_id": conv_id, "n_mentions": n_m, "n_turns": n_t, "max_turn_idx": mx, "closed": False}]
        )

    return (
        mentions_stream.withWatermark("ts", gap)
        .groupBy("conv_id")
        .applyInPandasWithState(
            update,
            outputStructType=PROGRESS_OUT_SCHEMA,
            stateStructType=EVENT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


CLOSED_MENTIONS_SCHEMA = "conv_id string, turn_idx int, occ_idx int, mention string, start_pos int"
SESSION_STATE_SCHEMA = "payload string, last_ts_ms bigint"


def closed_conversation_mentions(
    mentions_stream: DataFrame, gap_ms: int = 30 * 60 * 1000
) -> DataFrame:
    """Sessionize the mention stream on event time: per-conversation state
    accumulates the conversation's mentions; when the watermark moves `gap`
    past its last mention the conversation CLOSES and its complete mention set
    is emitted (occ_idx assigned by (turn_idx, start_pos) order — identical to
    the batch detector's per-turn match index, since matches are emitted
    left-to-right and never overlap). Open conversations emit nothing.

    State is one JSON payload per live conversation — bounded by the
    conversation itself, the same bound the batch groupBy(conv_id) kernel
    already requires, evicted at close. This is the streaming front half of
    sessionized disambiguation; feed the output to
    :func:`run_sessionized_links` to disambiguate each closed session."""
    import json as _json

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap = f"{gap_ms} milliseconds"
    session_tz = mentions_stream.sparkSession.conf.get("spark.sql.session.timeZone")

    def update(key: tuple, pdfs, state: GroupState):
        conv_id = key[0]
        if state.hasTimedOut:
            payload, _last = state.get
            state.remove()
            rows = _json.loads(payload)
            rows.sort(key=lambda r: (r[0], r[1]))  # (turn_idx, start_pos)
            occ: dict[int, int] = {}
            out = []
            for turn_idx, start_pos, mention in rows:
                i = occ.get(turn_idx, 0)
                occ[turn_idx] = i + 1
                out.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": turn_idx,
                        "occ_idx": i,
                        "mention": mention,
                        "start_pos": start_pos,
                    }
                )
            yield pd.DataFrame(out)
            return
        payload, last_ms = state.get if state.exists else ("[]", 0)
        rows = _json.loads(payload)
        for pdf in pdfs:
            rows.extend(
                [int(t), int(s), m]
                for t, s, m in zip(pdf["turn_idx"], pdf["start_pos"], pdf["mention"])
            )
            ts_max = pdf["ts"].max()
            if pd.notna(ts_max):
                t = pd.Timestamp(ts_max)
                if t.tz is None:
                    t = t.tz_localize(session_tz)
                last_ms = max(last_ms, int(t.value // 1_000_000))
        state.update((_json.dumps(rows), last_ms))
        state.setTimeoutTimestamp(max(last_ms + gap_ms, state.getCurrentWatermarkMs() + 1))
        # open conversations emit nothing (the timeout branch above yields,
        # which is what makes this function the generator the API requires)

    return (
        mentions_stream.withWatermark("ts", gap)
        .groupBy("conv_id")
        .applyInPandasWithState(
            update,
            outputStructType=CLOSED_MENTIONS_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_sessionized_links(
    closed_mentions: DataFrame,
    dico: DataFrame,
    kb_edges: DataFrame,
    rel_weights: DataFrame,
    cfg,
    out_path: str,
    checkpoint: str,
) -> None:
    """Streaming sessionized disambiguation: each micro-batch of CLOSED
    conversations (from :func:`closed_conversation_mentions`) runs the full
    batch kernel — candidate generation, ambiguity gate, grouped per-session
    graph disambiguation — via foreachBatch, appending final links per closed
    session. Conversations are whole by construction (the session only closes
    once the watermark passes its gap), so the per-batch result is EXACTLY the
    batch pipeline's links for those conversations (pytest-pinned), arriving
    incrementally instead of at corpus end."""
    from ..operators.candidates import conversation_cases, generate_candidates
    from ..operators.grouped import disambiguate_grouped

    def process_batch(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cands = generate_candidates(batch_df, dico)
        cases = conversation_cases(batch_df, cands)
        links = disambiguate_grouped(batch_df, cands, kb_edges, rel_weights, cases, cfg)
        links.write.mode("append").parquet(out_path)

    q = (
        closed_mentions.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_available_now(stream_df: DataFrame, out_path: str, checkpoint: str) -> None:
    """Drain everything currently available into a parquet sink and stop."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_dedup_exact(docs_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: keep the FIRST arrival of each normalized
    content key, drop every later copy. State = one row per distinct key,
    bounded by the event-time watermark (`dropDuplicatesWithinWatermark`, so
    a key's state is evicted once the watermark passes its arrival — the
    at-scale requirement; an unwatermarked dropDuplicates would grow state
    with corpus cardinality forever). Same content key as the batch
    `dedup.exact_dedup` (md5 of whitespace-normalized lowercased text), so a
    drained stream's survivor set per key equals the batch winner set when
    all copies arrive inside one watermark.
    """
    from ..operators.dedup import norm_text

    return (
        docs_stream.withColumn("content_key", F.md5(norm_text(F.col("text"))))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["content_key"])
    )
