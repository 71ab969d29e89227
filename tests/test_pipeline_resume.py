"""Checkpoint/resume: identical final output when restarting from any stage."""

import json

from reden_spark import datagen
from reden_spark.operators.disambiguate import NELConfig
from reden_spark.plans.pipeline import run_pipeline
from reden_spark.sources import storage

CFG = NELConfig(base_prefix=datagen.BASE_PREFIX, preferred_uri=datagen.BASE_PREFIX)


def _triples(dfs):
    return sorted((r.subj, r.pred, r.obj) for r in dfs["triples"].collect())


def test_resume_from_each_stage(spark, fixture_dir, tmp_path):
    out = tmp_path / "kg_out"
    first = run_pipeline(spark, fixture_dir, out, CFG)
    baseline = _triples(first)
    assert len(baseline) > 100
    assert "metrics" in first

    # full resume: every stage loads from checkpoint (manifests untouched)
    manifests = {s: storage.read_manifest(out, s)["written_at"] for s in ["mentions", "links", "triples"]}
    again = run_pipeline(spark, fixture_dir, out, CFG)
    assert _triples(again) == baseline
    for s, ts in manifests.items():
        assert storage.read_manifest(out, s)["written_at"] == ts  # not recomputed

    # restart from the links stage: links+triples+metrics recomputed, same output
    redo = run_pipeline(spark, fixture_dir, out, CFG, from_stage="links")
    assert _triples(redo) == baseline
    assert storage.read_manifest(out, "links")["written_at"] > manifests["links"]
    assert storage.read_manifest(out, "mentions")["written_at"] == manifests["mentions"]


def test_reliable_checkpoint_mode_same_output(spark, fixture_dir, tmp_path):
    """The fault-tolerant checkpoint mode (df.checkpoint to a checkpoint dir —
    the multi-executor-cluster setting where localCheckpoint blocks would die
    with a lost executor) must produce byte-identical triples. Also pins that
    the mode actually engaged: the checkpoint dir is populated."""
    from reden_spark import checkpointing

    base = run_pipeline(spark, fixture_dir, tmp_path / "kg_local", CFG)
    baseline = _triples(base)
    try:
        rel = run_pipeline(
            spark, fixture_dir, tmp_path / "kg_rel", CFG, checkpoint_mode="reliable"
        )
        assert _triples(rel) == baseline
        ckdir = tmp_path / "kg_rel" / ".spark_checkpoints"
        assert any(ckdir.rglob("*")), "reliable mode never wrote a checkpoint block"
    finally:
        checkpointing.set_checkpoint_mode(None)
        # leave the session's checkpoint dir harmlessly set (session-scoped)


def test_persist_checkpoint_mode_same_output(spark, fixture_dir, tmp_path):
    """persist mode (full lineage kept, recomputable after executor loss)."""
    from reden_spark import checkpointing

    base = run_pipeline(spark, fixture_dir, tmp_path / "kg_local2", CFG)
    try:
        per = run_pipeline(
            spark, fixture_dir, tmp_path / "kg_persist", CFG, checkpoint_mode="persist"
        )
        assert _triples(per) == _triples(base)
    finally:
        checkpointing.set_checkpoint_mode(None)


def test_bucketed_input_and_plain_layout_same_output(spark, fixture_dir, tmp_path):
    """Byte-identical triples across (a) the round-2 'plain' checkpoint layout,
    (b) the bucketed layout over a plain input, and (c) the bucketed layout
    over a conv_id-bucketed INPUT table (the production ingest layout, where
    the mentions write becomes fully shuffle-free). Also pins that the
    bucketed-input mentions checkpoint did not fan out into tasks x buckets
    files."""
    import shutil

    from reden_spark.sources import storage

    base = run_pipeline(spark, fixture_dir, tmp_path / "kg_plain", CFG, layout="plain")
    baseline = _triples(base)

    buck = run_pipeline(spark, fixture_dir, tmp_path / "kg_buck", CFG)
    assert _triples(buck) == baseline

    # bucketed-input corpus: copy the fixture, rewrite transcripts bucketed
    data2 = tmp_path / "fixture_bucketed"
    shutil.copytree(fixture_dir, data2)
    df = spark.read.parquet(str(data2 / "transcripts.parquet"))
    storage.write_stage(df, data2, "transcripts.tmp", spark_bucket_col="conv_id", n_buckets=8)
    src = data2 / "transcripts.parquet"
    shutil.rmtree(src) if src.is_dir() else src.unlink()
    (data2 / "transcripts.tmp").rename(src)

    bi = run_pipeline(spark, data2, tmp_path / "kg_bin", CFG)
    assert _triples(bi) == baseline
    m_files = list((tmp_path / "kg_bin" / "mentions").glob("*.parquet"))
    assert 0 < len(m_files) <= 8, len(m_files)  # shuffle-free write kept 1 file/bucket


def test_lineage_counters(spark, fixture_dir, tmp_path):
    out = tmp_path / "kg_out2"
    run_pipeline(spark, fixture_dir, out, CFG)
    m = storage.read_manifest(out, "mentions")
    assert m["rows"] == sum(p["rows"] for p in m["lineage"])
    assert len(m["lineage"]) >= 1
    assert json.dumps(m)  # serializable


def test_checkpoint_shared_mode_matrix_same_triples(spark, fixture_dir, tmp_path, monkeypatch):
    """A 100 TB deployment runs reliable+eager; the sandbox default is
    local+eager; ops may flip REDEN_SHARED_SUBTREE per host. All six
    (checkpoint_mode x shared-subtree-mode) cells must emit the identical
    triple set (VERDICT r4 task #7)."""
    from reden_spark import checkpointing

    baseline = None
    try:
        for ck in ("local", "reliable"):
            for sub in ("eager", "lazy", "hybrid"):
                monkeypatch.setenv("REDEN_SHARED_SUBTREE", sub)
                out = tmp_path / f"kg_{ck}_{sub}"
                dfs = run_pipeline(spark, fixture_dir, out, CFG, checkpoint_mode=ck)
                got = _triples(dfs)
                if baseline is None:
                    baseline = got
                    assert len(baseline) > 100
                else:
                    assert got == baseline, f"cell ({ck}, {sub}) diverged"
    finally:
        checkpointing.set_checkpoint_mode(None)


def test_survivors_mode_parity(spark, fixture_dir, tmp_path, monkeypatch):
    """The barrier-free inline survivors materialization (lazy persist of the
    bridge-only remainder, no distinct — VERDICT r4 task #3) must emit exactly
    the triples of the round-4 barrier shape."""
    outs = {}
    for mode in ("inline", "barrier"):
        monkeypatch.setenv("REDEN_SURVIVORS_MODE", mode)
        dfs = run_pipeline(spark, fixture_dir, tmp_path / f"kg_sv_{mode}", CFG)
        outs[mode] = _triples(dfs)
    assert len(outs["inline"]) > 100
    assert outs["inline"] == outs["barrier"]
