"""Streaming ingestion: availableNow drain must equal the batch operators."""

from reden_spark import schemas
from reden_spark.operators.mentions import detect_mentions
from reden_spark.streaming.ingest import run_available_now, stream_mentions, stream_transcripts


def test_stream_mentions_equals_batch(spark, tables, fixture_dir, tmp_path):
    import shutil

    src_dir = tmp_path / "stream_in"  # file streams read directories
    src_dir.mkdir()
    shutil.copy(fixture_dir / "transcripts.parquet", src_dir / "part-0.parquet")
    stream = stream_transcripts(spark, str(src_dir), schemas.TRANSCRIPTS)
    assert stream.isStreaming
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    run_available_now(stream_mentions(stream, tables["mention_terms"]), out, ckpt)

    got = {
        (r.conv_id, r.turn_idx, r.mention, r.start_pos)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.conv_id, r.turn_idx, r.mention, r.start_pos)
        for r in detect_mentions(tables["transcripts"], tables["mention_terms"]).collect()
    }
    assert got == want and len(got) > 50
