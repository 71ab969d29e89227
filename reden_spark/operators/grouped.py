"""Stage 3 (variant) — per-conversation disambiguation via groupBy(conv_id).applyInPandas.

The grouped-map formulation the north star sketches: one task materializes one
conversation's candidates + the KB slice relevant to them, and runs the exact
single-node kernel from oracle.py (fuse -> prune -> degree -> argmax) in pandas.

Production default remains the relational implementation (disambiguate.py) —
it distributes *within* conversations, while this variant concentrates each
conversation in one task (the skew hazard). The KB slice is pre-filtered with an
equi-join on the conversation's probe keys (SURVEY.md §7 hazard 6) so a group
never drags the whole KB into memory; tests assert both implementations agree.
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import oracle
from ..functions.text import decompose, encode_last_segment
from .candidates import conversation_cases  # noqa: F401  (re-export convenience)
from .disambiguate import NELConfig, simple_links

_OUT_SCHEMA = "conv_id string, mention string, chosen_uris string, score double"


def _kb_slice(candidates: DataFrame, kb_edges: DataFrame, cfg: NELConfig) -> DataFrame:
    """(conv_id, subj, pred, obj): KB rows reachable by this conversation's probes —
    sameAs rows of base members, plus triples of every alias in raw, decomposed and
    %-encoded form."""
    members = candidates.select("conv_id", F.explode("uris").alias("member"))
    keys = (
        members.select("conv_id", F.col("member").alias("k"))
        .unionByName(members.select("conv_id", decompose("member").alias("k")))
        .unionByName(members.select("conv_id", encode_last_segment(decompose("member")).alias("k")))
    )
    sameas_objs = (
        members.filter(F.col("member").contains(F.lit(cfg.base_prefix)))
        .join(
            kb_edges.filter(F.col("pred") == cfg.sameas_pred).select("subj", "obj"),
            members.member == F.col("subj"),
        )
        .select("conv_id", decompose("obj").alias("k"))
    )
    all_keys = (
        keys.unionByName(sameas_objs)
        .unionByName(sameas_objs.select("conv_id", encode_last_segment("k").alias("k")))
        .distinct()
    )
    return all_keys.join(kb_edges, all_keys.k == kb_edges.subj).select(
        "conv_id", "subj", "pred", "obj"
    )


def disambiguate_grouped(
    mentions: DataFrame,
    candidates: DataFrame,
    kb_edges: DataFrame,
    rel_weights: DataFrame,
    cases: DataFrame,
    cfg: NELConfig,
) -> DataFrame:
    """Same contract as disambiguate.disambiguate, graph path via applyInPandas."""
    rels = {r["pred"].lower(): float(r["weight"]) for r in rel_weights.collect()}
    base_prefix, preferred = cfg.base_prefix, cfg.preferred_uri
    measure, crawl_sameas = cfg.centrality, cfg.crawl_sameas

    ok_convs = cases.filter(F.col("case") == "Ok").select("conv_id")
    simple_convs = cases.filter(F.col("case") == "NoAmbiguity").select("conv_id")
    cand_ok = candidates.join(ok_convs, "conv_id", "left_semi")

    cand_rows = cand_ok.select(
        "conv_id",
        F.lit("cand").alias("kind"),
        F.col("mention").alias("a"),
        F.col("group_idx").cast("string").alias("b"),
        F.to_json(F.struct("uris")).alias("c"),
    )
    kb_rows = _kb_slice(cand_ok, kb_edges, cfg).select(
        "conv_id",
        F.lit("kb").alias("kind"),
        F.col("subj").alias("a"),
        F.col("pred").alias("b"),
        F.col("obj").alias("c"),
    ).distinct()
    combined = cand_rows.unionByName(kb_rows)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import json

        conv_id = pdf["conv_id"].iloc[0]
        cands: dict[str, list[tuple[str, ...]]] = defaultdict(dict)  # mention -> {idx: group}
        kb_triples: list[tuple[str, str, str]] = []
        for kind, a, b, c in zip(pdf["kind"], pdf["a"], pdf["b"], pdf["c"]):
            if kind == "cand":
                cands[a][int(b)] = tuple(json.loads(c)["uris"])
            else:
                kb_triples.append((a, b, c))
        cand_map = {m: [g[i] for i in sorted(g)] for m, g in cands.items()}
        kb = oracle.KB.from_rows(kb_triples)

        colored = oracle._colored_nodes(cand_map, base_prefix)
        vertices, edges = oracle.fuse_graph(cand_map, kb, base_prefix, rels, crawl_sameas)
        inverted = oracle.build_inverted_index(cand_map)
        vertices, edges = oracle.prune_graph(vertices, edges, colored, inverted)
        # full centralityMeasure dispatch (CentralityHandler.java:137-152):
        # Degree / BrandesBetweenness / FreemanCloseness / Eigenvector
        scores = oracle.centrality_scores(vertices, edges, measure)
        chosen = oracle.choose_uris(cand_map, colored, scores, preferred)
        return pd.DataFrame(
            [
                {"conv_id": conv_id, "mention": m, "chosen_uris": u, "score": s}
                for m, (u, s) in chosen.items()
            ],
            columns=["conv_id", "mention", "chosen_uris", "score"],
        )

    graph_chosen = (
        combined.groupBy("conv_id").applyInPandas(kernel, _OUT_SCHEMA).withColumn("path", F.lit("graph"))
    )
    simple_chosen = simple_links(candidates.join(simple_convs, "conv_id", "left_semi")).withColumn(
        "path", F.lit("simple")
    )
    chosen = graph_chosen.unionByName(simple_chosen)
    return (
        mentions.select("conv_id", "turn_idx", "occ_idx", "mention")
        .join(chosen, ["conv_id", "mention"], "inner")
        .select("conv_id", "turn_idx", "occ_idx", "mention", "chosen_uris", "score", "path")
    )
