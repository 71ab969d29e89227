"""Hachey metric definitions (ResultsAndEvaluationNEL.java:393-557) on a
hand-checkable micro corpus."""

import pytest

from reden_spark.operators.evaluate import eval_records, hachey_metrics


def test_metrics_hand_checked(spark):
    # 5 gold mentions in one conversation:
    #  m1: gold=e1, 2 cand groups containing e1, chosen e1      -> good choice
    #  m2: gold=e2, 2 cand groups containing e2, chosen e3      -> wrong choice
    #  m3: gold=e4, 1 cand group NOT containing e4, chosen e5   -> cand recall miss
    #  m4: gold=NIL, no candidates, no choice                   -> good NIL
    #  m5: gold=NIL, 1 cand group, chosen e6                    -> should have been NIL
    gold = spark.createDataFrame(
        [
            ("c", 0, 0, "m1", "http://kb/e1"),
            ("c", 0, 1, "m2", "http://kb/e2"),
            ("c", 1, 0, "m3", "http://kb/e4"),
            ("c", 1, 1, "m4", None),
            ("c", 2, 0, "m5", None),
        ],
        "conv_id string, turn_idx int, occ_idx int, mention string, gold_uri string",
    )
    candidates = spark.createDataFrame(
        [
            ("c", "m1", 0, ["http://kb/e1", "http://alt/e1"]),
            ("c", "m1", 1, ["http://kb/e9"]),
            ("c", "m2", 0, ["http://kb/e2"]),
            ("c", "m2", 1, ["http://kb/e3"]),
            ("c", "m3", 0, ["http://kb/e5"]),
            ("c", "m5", 0, ["http://kb/e6"]),
        ],
        "conv_id string, mention string, group_idx int, uris array<string>",
    )
    links = spark.createDataFrame(
        [
            ("c", 0, 0, "m1", "http://kb/e1", 2.0, "graph"),
            ("c", 0, 1, "m2", "http://kb/e3", 1.0, "graph"),
            ("c", 1, 0, "m3", "http://kb/e5", 1.0, "graph"),
            ("c", 2, 0, "m5", "http://kb/e6", None, "simple"),
        ],
        "conv_id string, turn_idx int, occ_idx int, mention string, chosen_uris string, score double, path string",
    )
    rec = eval_records(gold, links, candidates)
    m = hachey_metrics(rec).collect()[0]

    assert m.nb_mentions == 5 and m.nb_manual == 3 and m.nb_nil == 2
    # candSizes = 2+2+1+1 = 6 over 5 mentions
    assert m.candidate_cardinality_mean == pytest.approx(6 / 5)
    # non-empty sets: m1,m2,m3,m5 -> correct-in-set: m1,m2 -> 2/4
    assert m.candidate_precision == pytest.approx(2 / 4)
    # manual: m1,m2,m3 -> correct-in-set: m1,m2 -> 2/3
    assert m.candidate_recall == pytest.approx(2 / 3)
    # empty sets: m4 -> NIL: m4 -> 1/1
    assert m.nil_precision == pytest.approx(1.0)
    # NIL: m4,m5 -> empty: m4 -> 1/2
    assert m.nil_recall == pytest.approx(1 / 2)
    # >=2 groups & correct-in-set: m1,m2 -> correct choice: m1 -> 1/2
    assert m.disambiguation_accuracy == pytest.approx(1 / 2)
    # (manual & correct choice: m1) + (empty & NIL & no choice: m4) = 2 over 5
    assert m.overall_linking_accuracy == pytest.approx(2 / 5)


def test_containment_semantics(spark):
    # choice-correct is case-SENSITIVE containment (:291); in-cand-set is
    # case-INsensitive (:282)
    gold = spark.createDataFrame(
        [("c", 0, 0, "m", "http://kb/E1")],
        "conv_id string, turn_idx int, occ_idx int, mention string, gold_uri string",
    )
    candidates = spark.createDataFrame(
        [("c", "m", 0, ["http://kb/e1x"])],
        "conv_id string, mention string, group_idx int, uris array<string>",
    )
    links = spark.createDataFrame(
        [("c", 0, 0, "m", "http://kb/e1x", 1.0, "graph")],
        "conv_id string, turn_idx int, occ_idx int, mention string, chosen_uris string, score double, path string",
    )
    r = eval_records(gold, links, candidates).collect()[0]
    assert r.correct_in_cand is True  # lower('http://kb/e1x') contains lower('http://kb/E1')
    assert r.choice_correct is False  # case-sensitive containment fails
