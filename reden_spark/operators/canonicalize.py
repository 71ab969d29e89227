"""Stage 4 — owl:sameAs canonicalization + triple materialization.

The reference only picks a per-group representative (`preferedURIOrder`,
CentralityHandler.java:196-213); the north rule requires cross-partition URI
fusion. Implemented as connected components over the sameAs edge DataFrame via
iterative min-label propagation (GraphFrames-style, no external dependency):

    label(v) <- min(label(v), min(label(n)) for n in neighbors(v))   until fixpoint

Converges in O(log(diameter)) rounds with large-star/small-star-ish behavior on
the doubled edge list; each round is one shuffle (groupBy v). Lineage is cut per
round with localCheckpoint so the plan doesn't grow unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import LINKS_TO, SAME_AS


def connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """edges(a, b) undirected -> (uri, canonical) where canonical = min URI of the
    component. Isolated URIs (not in edges) are their own canonical and are not
    returned — callers coalesce(canonical, uri)."""
    sym = edges.select(F.col("a"), F.col("b")).unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    # adjacency including self so labels persist: (v, neighbor)
    adj = sym.unionByName(sym.select(F.col("a"), F.col("a").alias("b"))).distinct()
    labels = adj.groupBy("a").agg(F.min("b").alias("label")).withColumnRenamed("a", "v")
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        # propagate: new label of v = min(label of v, min over neighbors' labels)
        nbr_labels = (
            adj.join(labels.withColumnRenamed("v", "b"), "b")
            .groupBy("a")
            .agg(F.min("label").alias("new_label"))
            .withColumnRenamed("a", "v")
        )
        merged = (
            labels.join(nbr_labels, "v", "left")
            .select("v", F.least("label", F.coalesce("new_label", "label")).alias("label"))
        )
        merged = merged.localCheckpoint(eager=True)
        changed = (
            merged.withColumnRenamed("label", "nl")
            .join(labels, "v")
            .filter(F.col("nl") != F.col("label"))
            .limit(1)
            .count()
        )
        labels = merged
        if changed == 0:
            break
    return labels.select(F.col("v").alias("uri"), F.col("label").alias("canonical"))


def sameas_edge_frame(kb_edges: DataFrame, dico: DataFrame, sameas_pred: str = SAME_AS) -> DataFrame:
    """Equivalence edges: KB owl:sameAs rows + dico group co-membership
    (a candidate group row already lists equivalent URIs, SURVEY.md §2.3)."""
    kb = kb_edges.filter(F.col("pred") == sameas_pred).select(
        F.col("subj").alias("a"), F.col("obj").alias("b")
    )
    grp = (
        dico.select(F.col("uris")[0].alias("a"), F.explode("uris").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    return kb.unionByName(grp).distinct()


def materialize_triples(
    links: DataFrame,
    kb_edges: DataFrame,
    dico: DataFrame,
    sameas_pred: str = SAME_AS,
) -> DataFrame:
    """LINKS -> output KG (subj, pred, obj):

      * one mention-link triple per linked occurrence:
        (urn:mention:<conv>:<turn>:<occ>, kg:linksTo, canonical(chosen));
      * pass-through KB triples of chosen entities, subject and object rewritten
        to their canonical URI; sameAs rows themselves are dropped (they are now
        encoded by the canonical labels).
    """
    canon = connected_components(sameas_edge_frame(kb_edges, dico, sameas_pred))

    chosen_uris = links.filter(F.col("chosen_uris") != "").select(
        "conv_id", "turn_idx", "occ_idx", F.explode(F.split("chosen_uris", " ")).alias("uri")
    )
    canon_chosen = (
        chosen_uris.join(canon, "uri", "left")
        .withColumn("c", F.coalesce("canonical", "uri"))
        .groupBy("conv_id", "turn_idx", "occ_idx")
        .agg(F.min("c").alias("entity"))
    )
    link_triples = canon_chosen.select(
        F.concat(F.lit("urn:mention:"), "conv_id", F.lit(":"), "turn_idx", F.lit(":"), "occ_idx").alias(
            "subj"
        ),
        F.lit(LINKS_TO).alias("pred"),
        F.col("entity").alias("obj"),
    )

    entities = canon_chosen.select(F.col("entity")).distinct()
    kb = kb_edges.filter(F.col("pred") != sameas_pred)
    kb_c = (
        kb.join(canon.withColumnRenamed("uri", "subj"), "subj", "left")
        .withColumn("csubj", F.coalesce("canonical", "subj"))
        .drop("canonical")
        .join(canon.withColumnRenamed("uri", "obj"), "obj", "left")
        .withColumn("cobj", F.coalesce("canonical", "obj"))
        .select(F.col("csubj").alias("subj"), "pred", F.col("cobj").alias("obj"))
    )
    passthrough = kb_c.join(entities.withColumnRenamed("entity", "subj"), "subj", "left_semi")
    # link_triples are unique by construction (one row per groupBy key, subject
    # encodes the key) and their urn:mention: subjects are disjoint from KB
    # subjects — dedupe only the passthrough side (canonical rewrite can merge
    # rows), sparing the full-output shuffle.
    return link_triples.unionByName(passthrough.distinct())
