"""Physical-plan shape assertions: the plans we designed for are the plans we get
(predicate pushdown to the scan, broadcast hash join for the dictionary probe,
whole-stage codegen around the relational stages, no cartesian products)."""

import pytest
from pyspark.sql import functions as F

from reden_spark import datagen
from reden_spark.operators.candidates import generate_candidates
from reden_spark.operators.mentions import detect_mentions


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")  # noqa: SLF001


def test_filter_pushdown_reaches_scan(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")).select(
        "l_returnflag", "l_quantity"
    )
    p = plan(q)
    assert "PushedFilters" in p and "l_shipdate" in p.split("PushedFilters")[1][:200]
    # column pruning: scan schema only carries the needed columns
    read_schema = p.split("ReadSchema")[1][:220]
    assert "l_returnflag" in read_schema and "l_extendedprice" not in read_schema


def test_candidate_join_is_broadcast(spark, tables):
    mentions = detect_mentions(tables["transcripts"], tables["mention_terms"])
    cands = generate_candidates(mentions, tables["dico"])
    p = plan(cands)
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_triples_no_occurrence_grain_shuffle(spark, tables):
    """materialize_triples resolves chosen_uris -> canonical entity on DISTINCT
    chosen_uris values and broadcasts the mapping back: the occurrence-grain
    link table must never be exchanged on its (conv_id, turn_idx, occ_idx)
    key (the naive per-occurrence explode+groupBy shuffled the full table)."""
    import re

    from reden_spark.operators.canonicalize import materialize_triples

    links = spark.createDataFrame(
        [("c1", 0, 0, "m", "http://kb.test/base/e1 http://ext.kb/x", 1.0, "graph")],
        "conv_id string, turn_idx int, occ_idx int, mention string, chosen_uris string, score double, path string",
    )
    t = materialize_triples(links, tables["kb_edges"], tables["dico"])
    p = plan(t)
    assert "BroadcastHashJoin" in p
    # no hash partitioning on the occurrence key anywhere in the plan
    assert not re.search(r"hashpartitioning\(conv_id[^)]*turn_idx", p), p


def test_mentions_stage_is_map_only(spark, tables):
    p = plan(detect_mentions(tables["transcripts"], tables["mention_terms"]))
    # no exchange: detection + occ_idx assignment never shuffles
    assert "Exchange" not in p
    assert "codegen id" in p  # surrounding projections stay in whole-stage codegen


def test_candidates_single_exchange(spark, tables):
    """The occurrence-grain side must shuffle exactly once (the distinct);
    group dedup + deterministic group_idx are precomputed dico-side (tiny
    window inside the BroadcastExchange), so nothing aggregates or shuffles
    after the join."""
    import re

    mentions = detect_mentions(tables["transcripts"], tables["mention_terms"])
    cands = generate_candidates(mentions, tables["dico"])
    p = plan(cands)
    # three Exchanges total: the probe distinct on the big side, plus the
    # dico-side distinct + window partitioning — both inside the (tiny)
    # BroadcastExchange subtree
    exchange_ids = {m.group(1) for m in re.finditer(r"\((\d+)\) Exchange", p)}
    assert len(exchange_ids) == 3, f"expected 3 Exchanges, got {len(exchange_ids)}\n{p[:1500]}"
    # nothing shuffles or aggregates above (downstream of) the broadcast join
    tree_above_join = p.split("BroadcastHashJoin")[0]
    assert "Exchange" not in tree_above_join, tree_above_join
    assert "HashAggregate" not in tree_above_join, tree_above_join
    # the big-side subtree (between the join and the BroadcastExchange marker)
    # carries exactly one Exchange: the distinct
    big_side = p.split("BroadcastHashJoin")[1].split("BroadcastExchange")[0]
    assert big_side.count("Exchange") == 1, big_side


def test_bucketed_checkpoints_elide_turn_grain_exchanges(spark, fixture_dir, tmp_path):
    """The scaling fix of round 3: turn-grain stage checkpoints are Spark
    bucketed tables on conv_id, so stage boundaries REUSE partitioning.
    Asserted properties:
      1. the checkpoint scan is bucketed and a groupBy(conv_id) over it plans
         NO Exchange;
      2. the occurrence join (links output shape) against a conv-grain frame
         derived from the same checkpoints plans NO Exchange at all — the
         round-2 profile's 237 MB mentions-side shuffle is gone;
      3. joining against a foreign (unpartitioned) frame shuffles ONLY that
         side, on the subset key (conv_id), never the bucketed side;
      4. the shuffle-free bucketed writes did not fan out into tasks x buckets
         files;
      5. mention triples landed in the bucket dir = pmod(murmur3(conv_id), n)
         — physically co-located with their links-checkpoint bucket, proving
         the triples write moved no mention-grain data."""
    import re

    from reden_spark.operators.disambiguate import NELConfig
    from reden_spark.plans.pipeline import run_pipeline
    from reden_spark.sources import storage

    out = tmp_path / "kg_bucketed"
    cfg = NELConfig(base_prefix=datagen.BASE_PREFIX, preferred_uri=datagen.BASE_PREFIX)
    run_pipeline(spark, fixture_dir, out, cfg)

    mentions = storage.read_stage(spark, out, "mentions")
    p1 = plan(mentions.groupBy("conv_id").count())
    assert "Bucketed: true" in p1, p1
    assert not re.findall(r"\(\d+\) Exchange\b", p1), p1  # shuffle exchanges only

    # the real links-output join: occurrence grain x (conv, mention)-grain
    # chosen, both sides rooted in bucketed checkpoints -> zero Exchange
    candidates = storage.read_stage(spark, out, "candidates")
    chosen = candidates.groupBy("conv_id", "mention").agg(F.min("uris")[0].alias("chosen_uris"))
    j = mentions.select("conv_id", "turn_idx", "occ_idx", "mention").join(
        chosen, ["conv_id", "mention"]
    )
    p2 = plan(j)
    # no SHUFFLE exchange anywhere: either zero-exchange bucketed SMJ, or AQE
    # broadcasts the conv-grain side (BroadcastExchange moves no turn-grain
    # rows) — in both shapes the occurrence table never shuffles
    assert not re.findall(r"\(\d+\) Exchange\b", p2), p2

    # a foreign frame must shuffle alone, clustered on the SUBSET key conv_id
    foreign = spark.createDataFrame([("c0", "AlbaniaX", "u")], "conv_id string, mention string, u string")
    p3 = plan(mentions.join(foreign.hint("shuffle_hash"), ["conv_id", "mention"]))
    assert len(re.findall(r"\(\d+\) Exchange\b", p3)) == 1, p3
    keys = re.findall(r"hashpartitioning\(([^)]*)\)", p3)
    assert keys and all("mention" not in k for k in keys), keys

    for st in ("candidates", "links"):
        files = list((out / st).glob("*.parquet"))
        assert 0 < len(files) <= 32, (st, len(files))

    raw = spark.read.parquet(str(out / "triples")).filter(F.col("subj").startswith("urn:mention:"))
    bad = raw.withColumn(
        "expect", F.pmod(F.hash(F.split_part(F.col("subj"), F.lit(":"), F.lit(3))), F.lit(32))
    ).filter(F.col("bucket") != F.col("expect"))
    assert bad.count() == 0


@pytest.mark.parametrize("n", [8, 64])
def test_n_buckets_knob_plan_shape(spark, fixture_dir, tmp_path, n):
    """`n_buckets` is the cluster scan-parallelism knob the 100 TB story
    claims: a stage checkpoint written with N buckets scans back as exactly N
    partitions (one task per bucket) and elides the Exchange of any
    conv_id-keyed downstream op — for EVERY N. Wall-time A/B of bucket counts
    is meaningless under this host's ±30-100 % noise (BENCH.md), so the knob's
    behavior is plan-guaranteed here instead."""
    import re

    from reden_spark.sources import storage

    df = spark.read.parquet(str(fixture_dir / "transcripts.parquet"))
    out = tmp_path / f"b{n}"
    storage.write_stage(df, out, "stage", spark_bucket_col="conv_id", n_buckets=n)
    back = storage.read_stage(spark, out, "stage")
    agg = back.groupBy("conv_id").count()
    p = plan(agg)
    assert "Bucketed: true" in p, p
    assert not re.findall(r"\(\d+\) Exchange\b", p), p
    # one scan task per bucket, reused by the exchange-free aggregate
    assert agg.rdd.getNumPartitions() == n
    files = list((out / "stage").glob("*.parquet"))
    assert 0 < len(files) <= n


def test_enrich_and_compare_ops(spark, tables, fixture_dir):
    import json

    from reden_spark.operators.candidates import conversation_cases
    from reden_spark.operators.compare import paired_scores, population_completeness, result_diff, result_intersection
    from reden_spark.operators.disambiguate import NELConfig, disambiguate
    from reden_spark.operators.enrich import assign_property, geojson_feature_collection, occurrence_counts

    cfg = NELConfig(datagen.BASE_PREFIX, datagen.BASE_PREFIX)
    mentions = detect_mentions(tables["transcripts"], tables["mention_terms"])
    candidates = generate_candidates(mentions, tables["dico"])
    cases = conversation_cases(mentions, candidates)
    links = disambiguate(mentions, candidates, tables["kb_edges"], tables["rel_weights"], cases, cfg)

    occ = occurrence_counts(links)
    assert occ.count() > 5 and occ.agg(F.sum("occurrences")).first()[0] > 0

    # property assignment: chosen URIs are base URIs, which carry note triples
    ents = occ.select("uri")
    enriched = assign_property(ents, tables["kb_edges"], ["http://kb.test/pred/note"], "note")
    with_note = enriched.filter(F.col("note").isNotNull())
    assert with_note.count() > 0
    assert with_note.first().note.startswith("http://kb.test/res/note/")
    pts = spark.createDataFrame([("e1", 48.85, 2.35)], "uri string, lat double, lon double")
    fc = json.loads(geojson_feature_collection(pts))
    assert fc["type"] == "FeatureCollection"
    assert fc["features"][0]["geometry"]["coordinates"] == [2.35, 48.85]
    assert fc["features"][0]["properties"]["uri"] == "e1"

    inter = result_intersection(links, links)
    assert inter.count() == links.select("conv_id", "turn_idx", "occ_idx", "mention").distinct().count()
    assert result_diff(links, links).count() == 0
    ps = paired_scores(links, links)
    assert ps.filter(F.col("score_a") != F.col("score_b")).count() == 0

    gold = tables["gold_links"]
    kb_uris = tables["dico"].select(F.explode("uris").alias("uri"))
    pc = population_completeness(gold, kb_uris).first()
    assert pc.n_covered == pc.n_gold_entities  # fixture gold is dico-covered
    assert pc.completeness == 1.0


def test_bne_dico_single_exchange(spark):
    """The BNE builder's only shuffle is the merge-by-URI aggregation: partial
    collect_sets before one hash Exchange on uri; the downstream explode /
    normalize / name projection adds no further data movement."""
    import re

    from reden_spark.plans.dico_build import build_bne_dico

    authors = spark.createDataFrame(
        [("u1", "Garcia-Lorca", "Federico (poeta)", "http://ext.kb/x", 2)],
        "uri string, accepted_form string, rejected_form string, ref string, n_works int",
    )
    p = plan(build_bne_dico(authors))
    exchange_ids = {m.group(1) for m in re.finditer(r"\((\d+)\) Exchange", p)}
    assert len(exchange_ids) == 1, f"expected 1 Exchange, got {len(exchange_ids)}\n{p[:1500]}"
    assert "hashpartitioning(uri" in p
    assert "partial_" in p  # map-side partial aggregation before the shuffle


def test_getty_and_dbpediafr_dico_single_exchange(spark):
    """The Getty and DBpedia-fr builders keep the BNE shape: one hash Exchange
    on uri (merge-by-URI) with map-side partial aggregation; comma-split /
    gender-title / alias-explode / ref-filter logic all stays map-local."""
    import re

    from reden_spark.plans.dico_build import build_dbpediafr_person_dico, build_getty_dico

    concepts = spark.createDataFrame(
        [("u1", "Gogh, Vincent van", "Vincent", "http://ext.kb/1", None)],
        "uri string, pref_label string, alt_label string, ref string, gender string",
    )
    persons = spark.createDataFrame(
        [("u1", "Arthur Rimbaud", "fr", "A. Rimbaud", "fr", "http://dbpedia.org/resource/R")],
        "uri string, label string, label_lang string, redirect_label string, "
        "redirect_lang string, sameas string",
    )
    for df in (build_getty_dico(concepts), build_dbpediafr_person_dico(persons)):
        p = plan(df)
        exchange_ids = {m.group(1) for m in re.finditer(r"\((\d+)\) Exchange", p)}
        assert len(exchange_ids) == 1, f"expected 1 Exchange, got {len(exchange_ids)}\n{p[:1500]}"
        assert "hashpartitioning(uri" in p
        assert "partial_" in p


def test_place_and_geonames_dico_single_exchange(spark):
    """The place builder keeps the author-builder shape — one hash Exchange on
    uri (merge-by-URI with map-side partial collect_sets); language filter,
    letter shard, sameAs prefix and alias explode all stay map-local. The
    Geonames builder (primary + exploded alternatenames union) shuffles once
    for its final distinct."""
    import re

    from reden_spark.plans.dico_build import build_place_dico, geonames_to_dico

    places = spark.createDataFrame(
        [("u1", "Paris", "fr", "Lutèce", "fr", True, 48.85, 2.35, "http://dbpedia.org/resource/P")],
        "uri string, label string, label_lang string, alt_label string, alt_lang string, "
        "is_place boolean, lat double, lon double, sameas string",
    )
    geonames = spark.createDataFrame(
        [(2988507, "Paris", "Lutece,Pariggi")],
        "geonameid int, name string, alternatenames string",
    )
    pp = plan(build_place_dico(places))
    exchange_ids = {m.group(1) for m in re.finditer(r"\((\d+)\) Exchange", pp)}
    assert len(exchange_ids) == 1, f"expected 1 Exchange, got {len(exchange_ids)}\n{pp[:1500]}"
    assert "hashpartitioning(uri" in pp
    assert "partial_" in pp  # map-side partial collect_sets before the shuffle

    # letter-sharded build: the shard predicate prunes MAP-SIDE (the reference's
    # 27-shard a-z+'other' workflow must not shuffle the whole dump per shard).
    # Formatted-explain ids are assigned leaf-first, so every Filter (type gate,
    # language, letter shard) must sit below the single merge Exchange.
    sp = plan(build_place_dico(places, letters=["p"]))
    ex = min(int(m.group(1)) for m in re.finditer(r"\((\d+)\) Exchange", sp))
    shard_filters = [
        int(m.group(1))
        for m in re.finditer(r"\((\d+)\) Filter\nInput[^\n]*\nCondition : [^\n]*RLIKE", sp)
    ]
    assert shard_filters and all(f < ex for f in shard_filters), sp[:1500]

    gp = plan(geonames_to_dico(geonames))
    exchange_ids = {m.group(1) for m in re.finditer(r"\((\d+)\) Exchange", gp)}
    assert len(exchange_ids) == 1, f"expected 1 Exchange, got {len(exchange_ids)}\n{gp[:1500]}"
    assert "hashpartitioning(" in gp


def test_media_decode_pipelines_are_map_only(spark):
    """The three real media pipelines (encode -> decode -> stats via
    mapInPandas) must contain ZERO Exchange: binary payloads are produced and
    consumed worker-side, never shuffled or collected."""
    from reden_spark.operators.multimodal import (
        attach_ppm_media,
        attach_wav_media,
        attach_y4m_media,
        audio_stats,
        frame_luma_stats,
        image_stats,
    )

    docs = spark.createDataFrame([(1, "alpha"), (2, "beta")], "doc_id long, text string")
    for df in (
        image_stats(attach_ppm_media(docs)),
        audio_stats(attach_wav_media(docs)),
        frame_luma_stats(attach_y4m_media(docs)),
    ):
        p = plan(df)
        assert "Exchange" not in p, p[:1200]


def test_curation_plan_shapes(spark):
    """Curation operators keep their designed physical shapes: stratified
    sampling = count-agg + window partitioning (2 Exchanges) with the quota
    table broadcast back; sequence packing = exactly one Exchange (the
    per-shard window); decontamination = shingle-join + per-doc agg +
    left-join back (3 Exchanges, holdout side broadcast). Never a cartesian
    product or a sort-merge join (everything joinable is broadcast-sized)."""
    import re

    from reden_spark.operators.curation import (
        decontaminate,
        pack_sequences,
        stratified_sample,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def shuffles(df):
        p = plan(df)
        assert "CartesianProduct" not in p and "SortMergeJoin" not in p, p[:1500]
        return len({m.group(1) for m in re.finditer(r"\((\d+)\) Exchange", p)}), p

    n, p = shuffles(stratified_sample(docs))
    assert n == 2 and "BroadcastHashJoin" in p, p[:1500]
    n, p = shuffles(pack_sequences(docs))
    assert n == 1, p[:1500]
    n, p = shuffles(decontaminate(docs.limit(400), docs.limit(100), 8))
    assert n == 3 and "BroadcastHashJoin" in p, p[:1500]


def test_chunk_windows_is_map_only(spark):
    """Sliding-window chunking must stay a single map-only pass: tokenize,
    generate chunk indices, slice, hash — no Exchange at any corpus size."""
    from reden_spark.operators.curation import chunk_windows

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = plan(chunk_windows(docs, window=24, stride=16))
    assert "Exchange" not in p, p[:1500]
    assert "Generate" in p  # the explode over chunk indices


def test_ngram_topk_hash_grain_and_takeordered(spark):
    """ngram_topk's designed shape: the heavy counting aggregates xxhash64
    longs (never corpus-sized string keys), the k-th-count threshold and the
    candidate-hash set reach the plan as broadcasts (no driver round-trip),
    strings materialize only on the thin candidate recount, and the global
    top-k is TakeOrderedAndProject — never a total sort."""
    import re

    from reden_spark.operators.textstats import ngram_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = plan(ngram_topk(docs, n=2, k=20))
    assert "TakeOrderedAndProject" in p, p[:1500]
    assert "xxhash64" in p, p[:1500]
    # the shared() checkpoint of the hash-grain count table cuts the heavy
    # exchange out of this plan (it ran once, in the checkpoint's own job);
    # both the threshold subquery and the candidate filter read the
    # checkpoint blocks back (>=2 ExistingRDD scans), and the corpus parquet
    # is scanned exactly twice — the heavy hash pass and the thin string
    # recount — never per consumer
    assert len(re.findall(r"Scan ExistingRDD", p)) >= 2, p[:2000]
    assert len(re.findall(r"Scan parquet", p)) == 2, p[:2000]
    # nothing partitions by (h, doc_id): doc_freq comes from the thin slice
    assert not re.search(r"hashpartitioning\(h#\d+L, doc_id", p), p[:2000]
    assert len(re.findall(r"\(\d+\) BroadcastExchange", p)) >= 2, p[:2000]
    assert "Sort" not in p, p[:1500]  # top-k must never be a total sort
    assert "CartesianProduct" not in p, p[:1500]


def test_perplexity_plan_shape(spark):
    """Bigram-LM scoring must stay pure codegen: no Python eval anywhere, the
    vocab-size scalar reaches the plan as a broadcast 1-row frame (never a
    shuffled join or a driver constant) and nothing is a CartesianProduct."""
    from reden_spark.operators.textstats import perplexity

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = plan(perplexity(docs))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p[:1500]
    assert "CartesianProduct" not in p, p[:1500]
    assert "BroadcastNestedLoopJoin" in p, p[:1500]  # the 1-row V crossJoin


def test_duplicated_spans_plan_shape(spark):
    """Duplicated-span detection: gram hashes travel as xxhash64 longs, the
    cross-doc flag is ONE gram-keyed window (min!=max over the gram
    partition) — no dup-gram semi join, no recomputed explode subtree — and
    no Cartesian/python anywhere."""
    import re

    from reden_spark.operators.dedup import duplicated_spans

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = plan(duplicated_spans(docs, n=8))
    assert len(re.findall(r"\(\d+\) Window\b", p)) == 1, p[:1500]
    assert "xxhash64" in p, p[:1500]
    assert "LeftSemi" not in p, p[:1500]
    # exactly one Generate: the explode subtree is not computed twice
    assert len(re.findall(r"\(\d+\) Generate\b", p)) == 1, p[:1500]
    assert "CartesianProduct" not in p, p[:1500]
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p[:1500]


def test_domain_cap_two_phase_rank(spark):
    """domain_cap must rank twice — the salted pre-cap then the exact re-rank
    — and every Exchange must be keyed (a SinglePartition exchange would mean
    a global sort snuck in)."""
    import re

    from reden_spark.operators.curation import domain_cap

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").withColumn(
        "text", F.concat(F.col("text"), F.lit(" http://host"), (F.col("doc_id") % 5).cast("string"), F.lit(".com/x"))
    )
    p = plan(domain_cap(docs, cap=3, n_salt=8))
    assert len(re.findall(r"\(\d+\) Window\b", p)) == 2, p[:2000]
    assert "Exchange SinglePartition" not in p, p[:2000]
    # Spark 4 additionally rewrites each rank<=cap filter into map-side
    # partial WindowGroupLimits — keep that optimization pinned: no more than
    # cap rows per (domain, salt) per input split ever reach either Exchange.
    assert "WindowGroupLimit" in p and ", Partial" in p, p[:2000]


def test_entity_pmi_plan_shape(spark, tables):
    """entity_pmi: the N scalar is a broadcast 1-row frame and the
    within-conversation self-join is keyed (no CartesianProduct)."""
    from reden_spark.operators.enrich import entity_pmi

    links = spark.createDataFrame(
        [("c1", 0, 0, "m", "http://a http://b", 1.0, "graph"),
         ("c2", 0, 0, "m", "http://a http://b", 1.0, "graph")],
        "conv_id string, turn_idx int, occ_idx int, mention string, chosen_uris string, score double, path string",
    )
    p = plan(entity_pmi(links, min_pairs=2))
    assert "CartesianProduct" not in p, p[:1500]
    assert "BroadcastNestedLoopJoin" in p, p[:1500]
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p[:1500]
