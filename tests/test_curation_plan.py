"""The checkpointed curation pipeline (plans/curation.py): resume from any
stage is output-identical, lineage counters are recorded, and the plan's final
`packed` table equals the contract row `curation_pipeline` (whose DuckDB
oracle pins the semantics end to end)."""

import json

from reden_spark.plans.curation import run_curation
from reden_spark.sources import storage

SF = "/root/testdata/sf0.001"


def _packed(dfs):
    return sorted(tuple(r) for r in dfs["packed"].collect())


def test_curation_resume_and_contract_parity(spark, tmp_path):
    out = tmp_path / "cur_out"
    first = run_curation(spark, SF, out)
    baseline = _packed(first)
    assert len(baseline) > 100

    # the plan's packed table IS the contract row (same operators, same params)
    from reden_spark.driver_contract import q_curation_pipeline

    contract = sorted(tuple(r) for r in q_curation_pipeline(spark, SF).collect())
    assert contract == baseline

    # full resume: every stage loads from its checkpoint
    manifests = {s: storage.read_manifest(out, s)["written_at"] for s in ["pairs", "packed"]}
    again = run_curation(spark, SF, out)
    assert _packed(again) == baseline
    for s, ts in manifests.items():
        assert storage.read_manifest(out, s)["written_at"] == ts  # not recomputed

    # restart from decontam: decontam+packed recomputed, pairs checkpoint reused
    redo = run_curation(spark, SF, out, from_stage="decontam")
    assert _packed(redo) == baseline
    assert storage.read_manifest(out, "packed")["written_at"] > manifests["packed"]
    assert storage.read_manifest(out, "pairs")["written_at"] == manifests["pairs"]

    # lineage counters (north rule): per-partition rows sum to the stage total
    m = storage.read_manifest(out, "packed")
    assert m["rows"] == sum(p["rows"] for p in m["lineage"]) == len(baseline)
    assert json.dumps(m)


def test_curation_holdout_never_packed(spark, tmp_path):
    """No eval-holdout doc (nor any non-kept duplicate, nor any contaminated
    doc) may reach the packed training table."""
    out = tmp_path / "cur_out2"
    dfs = run_curation(spark, SF, out)
    packed_ids = {r.doc_id for r in dfs["packed"].select("doc_id").collect()}
    holdout_ids = {r.doc_id for r in dfs["holdout"].select("doc_id").collect()}
    dropped = {r.doc_id for r in dfs["clusters"].filter("NOT keep").collect()}
    contaminated = {r.doc_id for r in dfs["decontam"].filter("contaminated").collect()}
    assert packed_ids.isdisjoint(holdout_ids)
    assert packed_ids.isdisjoint(dropped)
    assert packed_ids.isdisjoint(contaminated)
    assert packed_ids  # non-empty
