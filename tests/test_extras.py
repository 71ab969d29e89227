"""Training-data-pipeline extras vs local DuckDB oracles on the driver testdata."""

import duckdb
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')")
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF_DIR}/embeddings.parquet')")
    return con


def test_exact_dedup_vs_duckdb(docs, duck):
    from reden_spark.operators.dedup import exact_dedup

    got = {(r.doc_id, r.content_key, r.n_copies) for r in exact_dedup(docs).collect()}
    want = {
        tuple(r)
        for r in duck.sql(
            """
            SELECT min(doc_id) AS doc_id,
                   md5(trim(regexp_replace(lower(text), '\\W+', ' ', 'g'))) AS content_key,
                   count(*) AS n_copies
            FROM documents GROUP BY 2
            """
        ).fetchall()
    }
    assert got == want and len(got) > 0


DUCK_SHINGLES = (
    "list_sort(list_distinct([array_to_string(words[i:i+{nm1}], ' ') "
    "for i in range(1, greatest(len(words) - {nm1}, 0) + 1)]))"
)


def _duck_shingle_cte(n):
    return f"""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\W+', ' ', 'g')), ' ') AS words
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_sort(list_distinct(
               [array_to_string(list_slice(words, i, i + {n - 1}), ' ')
                for i in generate_series(1, greatest(len(words) - {n - 1}, 0))])) AS shingles
      FROM toks
    )
    """


def test_minhash_lsh_pairs_vs_duckdb(docs, duck):
    from reden_spark.operators.dedup import minhash_lsh_pairs

    got = {(r.doc_a, r.doc_b, r.jaccard) for r in minhash_lsh_pairs(docs, 12, 3, 4, 0.5).collect()}
    want = {
        tuple(r)
        for r in duck.sql(
            _duck_shingle_cte(3)
            + """
            , sigbase AS (
              SELECT doc_id, shingles,
                     [('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 FOR s IN shingles] AS hv
              FROM sh WHERE len(shingles) > 0
            ), sig AS (
              SELECT doc_id, shingles,
                     [list_min([((1 + h*1000003) * b + 12345 + h*7919) % 2147483647 FOR b IN hv]) FOR h IN range(0, 12)] AS sig
              FROM sigbase
            ), banded AS (
              SELECT doc_id, shingles, unnest(
                [md5(b::VARCHAR || '#' || array_to_string(list_slice(sig, b*3+1, b*3+3), ',')) FOR b IN range(0, 4)]
              ) AS band_key FROM sig
            ), pairs AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.shingles AS sh_a, b.shingles AS sh_b
              FROM banded a JOIN banded b USING (band_key) WHERE a.doc_id < b.doc_id
            )
            SELECT * FROM (
              SELECT doc_a, doc_b,
                     round(len(list_intersect(sh_a, sh_b))::DOUBLE /
                           (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))), 6) AS jaccard
              FROM pairs
            ) WHERE jaccard >= 0.5
            """
        ).fetchall()
    }
    assert got == want


def test_ngram_jaccard_vs_duckdb(docs, duck):
    """2-of-4 min-shingle banding + exact Jaccard verification, mirrored 1:1
    by the DuckDB oracle."""
    from reden_spark.driver_contract import O_DEDUP_NGRAM
    from reden_spark.operators.dedup import ngram_jaccard_pairs

    got = {(r.doc_a, r.doc_b, r.jaccard) for r in ngram_jaccard_pairs(docs, 3, 0.8).collect()}
    want = {tuple(r) for r in duck.sql(O_DEDUP_NGRAM).fetchall()}
    assert got == want


def test_ngram_banding_bounds_hot_block(spark):
    """Adversarial corpus: one shingle shared by EVERY document (and present in
    every doc's 4-smallest set, since each doc has exactly 4 shingles). A
    single-min-shingle block key could put all N docs in one block -> N^2/2
    candidate pairs; the 2-of-4 pair keys need TWO shared min-shingles, so the
    ubiquitous shingle creates zero cross-document candidates."""
    from pyspark.sql import functions as F

    from reden_spark.operators.dedup import (
        _min_shingle_band_keys,
        ngram_jaccard_pairs,
        word_shingles,
    )

    n = 200
    # 6 words -> exactly 4 word-3-gram shingles; the first ("common anchor
    # phrase") is identical across all docs, the rest are doc-unique
    docs = spark.createDataFrame(
        [(i, f"common anchor phrase u{i}a u{i}b u{i}c") for i in range(n)],
        "doc_id int, text string",
    )
    sh = docs.select(
        "doc_id", "text", word_shingles(F.col("text"), 3).alias("shingles")
    )
    keyed = sh.select("doc_id", F.explode(_min_shingle_band_keys()).alias("block"))
    a = keyed.select(F.col("doc_id").alias("doc_a"), "block")
    b = keyed.select(F.col("doc_id").alias("doc_b"), "block")
    n_candidates = (
        a.join(b, "block").filter(F.col("doc_a") < F.col("doc_b")).select("doc_a", "doc_b").distinct().count()
    )
    assert n_candidates == 0
    assert ngram_jaccard_pairs(docs, 3, 0.8).count() == 0


def test_minhash_salt_preserves_pairs(docs):
    """salt>1 redistributes hot bands across tasks but must not change the
    candidate pair set."""
    from reden_spark.operators.dedup import minhash_lsh_pairs

    base = {(r.doc_a, r.doc_b, r.jaccard) for r in minhash_lsh_pairs(docs, 12, 3, 4, 0.5).collect()}
    salted = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_lsh_pairs(docs, 12, 3, 4, 0.5, salt=4).collect()
    }
    assert base == salted and len(base) > 0


def test_simhash_pairs_match_bruteforce(docs):
    """Pigeonhole guarantee: with n_chunks >= max_hamming+1 derived chunks, the
    chunk-blocked pair set equals the brute-force all-pairs set within
    max_hamming (recall = 1.0, not LSH-approximate)."""
    from reden_spark.operators.dedup import simhash64, simhash_near_pairs

    max_h = 12
    hashes = {r.doc_id: r.simhash & ((1 << 64) - 1) for r in simhash64(docs, 2).collect()}
    ids = sorted(hashes)
    want = set()
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            d = bin(hashes[da] ^ hashes[db]).count("1")
            if d <= max_h:
                want.add((da, db, d))
    got = {(r.doc_a, r.doc_b, r.hamming) for r in simhash_near_pairs(docs, 2, max_h).collect()}
    assert got == want


def test_pairwise_dup_candidates_vs_duckdb(emb, duck):
    """Sign-LSH embedding dedup is fully oracle-checkable (integer hyperplanes,
    Column-expression bucketing) and non-empty on the fixture."""
    from reden_spark.driver_contract import _o_dedup_embedding
    from reden_spark.operators.similarity import pairwise_dup_candidates

    got = {(r.id_a, r.id_b, r.sim) for r in pairwise_dup_candidates(emb, 0.3, 4).collect()}
    want = {tuple(r) for r in duck.sql(_o_dedup_embedding()).fetchall()}
    assert got == want and len(got) > 0


def test_pairwise_dup_seeded_near_duplicates(spark):
    """Seeded near-duplicate embeddings (base + tiny noise) must all be found;
    the full result must equal a brute-force numpy oracle applying the same
    planes, bucketing and threshold."""
    import numpy as np

    from reden_spark.operators.similarity import int_hyperplanes, pairwise_dup_candidates

    rng = np.random.RandomState(3)
    dim, n_pairs = 16, 10
    base = rng.standard_normal((n_pairs, dim)).astype(np.float32)
    vecs = {}
    for i, v in enumerate(base):
        vecs[2 * i] = v
        vecs[2 * i + 1] = (v + 0.001 * rng.standard_normal(dim)).astype(np.float32)
    emb = spark.createDataFrame(
        [(k, [float(x) for x in v]) for k, v in vecs.items()],
        "vec_id int, embedding array<float>",
    )
    got = {(r.id_a, r.id_b) for r in pairwise_dup_candidates(emb, threshold=0.99, n_planes=4).collect()}

    planes = int_hyperplanes(dim, 4)
    def bucket(v):
        return int(((v.astype(np.float64) @ planes.T) > 0).dot(1 << np.arange(4)))
    want = set()
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bucket(vecs[a]) != bucket(vecs[b]):
                continue
            va, vb = vecs[a].astype(np.float64), vecs[b].astype(np.float64)
            sim = round(float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))), 6)
            if sim >= 0.99:
                want.add((a, b))
    seeded = {(2 * i, 2 * i + 1) for i in range(n_pairs)}
    assert got == want
    assert seeded <= got  # every seeded near-dup recovered


def test_token_count_and_quality_vs_duckdb(docs, duck):
    from reden_spark.operators.textstats import quality_score, token_count

    got = {tuple(r) for r in token_count(docs).collect()}
    want = {
        tuple(r)
        for r in duck.sql(
            """
            SELECT doc_id,
                   len(string_split(trim(regexp_replace(lower(text), '\\W+', ' ', 'g')), ' '))::INT AS n_words,
                   ceil(length(text) / 4)::INT AS n_subwords_est
            FROM documents
            """
        ).fetchall()
    }
    assert got == want

    got_q = {(r.doc_id, r.n_words, r.stopword_ratio, r.punct_ratio, r.quality) for r in quality_score(docs).collect()}
    want_q = {
        tuple(r)
        for r in duck.sql(
            """
            WITH t AS (
              SELECT doc_id, text,
                     string_split(trim(regexp_replace(lower(text), '\\W+', ' ', 'g')), ' ') AS toks
              FROM documents
            ), m AS (
              SELECT doc_id,
                     len(toks)::INT AS n_words,
                     len(list_filter(toks, t -> t IN ('a','and','das','de','der','die','el','est','et','ein','in','is','ist','la','le','of','the','to','un','una','une','und','y','zu','es'))) AS stop_hits,
                     length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS punct,
                     length(text) AS n_chars
              FROM t
            )
            SELECT doc_id, n_words,
                   round(stop_hits::DOUBLE / greatest(n_words, 1), 6) AS stopword_ratio,
                   round(punct::DOUBLE / greatest(n_chars, 1), 6) AS punct_ratio,
                   round(0.4 * (stop_hits::DOUBLE / greatest(n_words, 1))
                       + 0.3 * least(n_words::DOUBLE / 100.0, 1.0)
                       + 0.3 * (1.0 - punct::DOUBLE / greatest(n_chars, 1)), 6) AS quality
            FROM m
            """
        ).fetchall()
    }
    assert got_q == want_q


def test_language_id(docs, duck):
    from reden_spark.operators.textstats import language_id

    rows = language_id(docs).collect()
    assert len(rows) == docs.count()
    assert {r.lang_pred for r in rows} <= {"en", "fr", "es", "de", "und"}


def test_cosine_topk_vs_duckdb(emb, duck):
    from reden_spark.operators.similarity import cosine_topk

    qids = [0, 1, 2]
    got = {(r.query_id, r.rank, r.neighbor_id) for r in cosine_topk(emb, qids, k=5).collect()}
    want = {
        tuple(r)
        for r in duck.sql(
            """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id IN (0,1,2)),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     round(
                       list_sum(list_transform(list_zip(qv, e.embedding), p -> p[1]::DOUBLE * p[2]::DOUBLE)) /
                       (sqrt(list_sum([ (x::DOUBLE)*(x::DOUBLE) FOR x IN qv ])) *
                        sqrt(list_sum([ (x::DOUBLE)*(x::DOUBLE) FOR x IN e.embedding ]))), 6) AS sim
              FROM q, embeddings e WHERE e.vec_id != q.query_id
            )
            SELECT query_id, rank, neighbor_id FROM (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
              FROM scored
            ) WHERE rank <= 5
            """
        ).fetchall()
    }
    assert got == want


def test_lsh_topk_recall(emb):
    from reden_spark.operators.similarity import cosine_topk, lsh_topk

    qids = [0, 1, 2, 3, 4]
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, qids, k=5).collect()}
    # Both bucketers (codegen integer planes = the oracle-checkable default;
    # numpy float planes = the high-dim UDF alternative) must beat the sanity
    # floor. Random-vector fixtures make recall seed-noisy (measured 0.16-0.28
    # at 2-4 planes for either bucketer), so the floor asserts "the candidate
    # cut retains signal", not approximation quality.
    for bucketer in ("codegen", "udf"):
        approx = {
            (r.query_id, r.neighbor_id)
            for r in lsh_topk(emb, qids, k=5, n_planes=3, bucketer=bucketer).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall > 0.1, bucketer


def test_ivf_topk_recall_and_shape(emb):
    from reden_spark.operators.similarity import cosine_topk, ivf_topk

    qids = [0, 1, 2, 3, 4]
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, qids, k=5).collect()}
    rows = ivf_topk(emb, qids, k=5, n_list=8, n_probe=2).collect()
    approx = {(r.query_id, r.neighbor_id) for r in rows}
    # each query returns <= k ranked rows, ranks dense from 1
    by_q: dict[int, list[int]] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())
    recall = len(exact & approx) / len(exact)
    assert recall > 0.2  # 2-of-8 cells probed: recall floor, not exactness
    # probing all cells must recover the exact result
    full = {(r.query_id, r.neighbor_id) for r in ivf_topk(emb, qids, k=5, n_list=8, n_probe=8).collect()}
    assert full == exact


def test_ivf_trained_centroids(emb):
    """Lloyd-trained quantizer: training actually moves the centroids, results
    stay deterministic across runs, the top-k shape holds, and probing all
    cells still recovers the exact result (training changes the cells, never
    the scoring)."""
    from reden_spark.operators.similarity import cosine_topk, ivf_topk, train_centroids

    qids = [0, 1, 2, 3, 4]
    init = {r.cid: list(r.cvec) for r in train_centroids(emb, 8, 0).collect()}
    trained = {r.cid: list(r.cvec) for r in train_centroids(emb, 8, 2).collect()}
    assert set(init) == set(trained) and any(init[c] != trained[c] for c in init)

    a = {(r.query_id, r.rank, r.neighbor_id) for r in ivf_topk(emb, qids, k=5, n_list=8, n_probe=2, train_iters=2).collect()}
    b = {(r.query_id, r.rank, r.neighbor_id) for r in ivf_topk(emb, qids, k=5, n_list=8, n_probe=2, train_iters=2).collect()}
    assert a == b and len({q for q, _, _ in a}) == len(qids)

    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, qids, k=5).collect()}
    full = {(r.query_id, r.neighbor_id) for r in ivf_topk(emb, qids, k=5, n_list=8, n_probe=8, train_iters=2).collect()}
    assert full == exact


def test_multimodal_plumbing(spark, docs):
    from reden_spark.operators.multimodal import (
        attach_fake_media,
        decode_media,
        extract_features,
        frame_sample_plan,
    )

    media = attach_fake_media(docs)
    feats = extract_features(media).collect()
    assert len(feats) == docs.count()
    by_id = {f.doc_id: f for f in feats}
    assert all(f.n_bytes == 16 for f in feats)  # md5 payload
    first = media.filter(F.col("doc_id") == feats[0].doc_id).first()
    assert by_id[first.doc_id].payload_md5 is not None
    frames = frame_sample_plan(media, every_ms=5000)
    assert frames.count() > 0
    with pytest.raises(NotImplementedError):
        decode_media(b"x", "image")


def test_ppm_image_stats_real_decode(spark, docs):
    """End-to-end REAL image pipeline (no codec libs): worker-side PPM encode ->
    mapInPandas header-parse + pixel statistics, verified against an
    independent pure-Python decode of the same payloads."""
    import hashlib

    from reden_spark.operators.multimodal import (
        attach_ppm_media,
        decode_ppm,
        encode_ppm,
        image_stats,
    )

    media = attach_ppm_media(docs)
    got = {r.doc_id: (r.width, r.height, r.mean_r, r.mean_g, r.mean_b)
           for r in image_stats(media).collect()}

    want = {}
    for row in docs.select("doc_id", "text").collect():
        w, h = row.doc_id % 7 + 2, row.doc_id % 5 + 2
        seed = hashlib.md5((row.text or "").encode()).digest()
        rgb = (seed * (w * h * 3 // len(seed) + 1))[: w * h * 3]
        # independent reference decode: plain ints, no numpy
        px = list(rgb)
        n = w * h
        means = tuple(sum(px[c::3]) // n for c in range(3))
        want[row.doc_id] = (w, h, *means)
        # round-trip through the real decoder too
        assert decode_ppm(encode_ppm(w, h, rgb)) == (w, h, *means)

    assert got == want and len(got) > 100

    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_ppm(b"JFIF not a ppm")


def test_wav_audio_stats_real_decode(spark, docs):
    """End-to-end REAL audio pipeline (no codec libs): worker-side PCM WAV
    encode -> mapInPandas RIFF parse + RMS, verified against an independent
    pure-Python struct decode of the same payloads."""
    import hashlib
    import struct

    from reden_spark.operators.multimodal import (
        attach_wav_media,
        audio_stats,
        decode_wav,
        encode_wav,
    )

    got = {r.doc_id: (r.sample_rate, r.n_samples, r.rms)
           for r in audio_stats(attach_wav_media(docs)).collect()}

    want = {}
    for row in docs.select("doc_id", "text").collect():
        n = row.doc_id % 50 + 10
        rate = 8000 + row.doc_id % 4 * 4000
        seed = hashlib.md5((row.text or "").encode()).digest()
        pcm = (seed * (2 * n // 16 + 1))[: 2 * n]
        samples = struct.unpack(f"<{n}h", pcm)
        rms = int((sum(s * s for s in samples) / n) ** 0.5)
        want[row.doc_id] = (rate, n, rms)
        assert decode_wav(encode_wav(rate, pcm)) == (rate, n, rms)

    assert got == want and len(got) > 100

    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_wav(b"OggS not a wav")


def test_y4m_frame_stats_real_decode(spark, docs):
    """End-to-end REAL video pipeline (no codec libs): worker-side y4m encode
    -> mapInPandas per-FRAME parse + luma means, verified against an
    independent pure-Python decode; one output row per frame."""
    import hashlib

    from reden_spark.operators.multimodal import (
        attach_y4m_media,
        decode_y4m_frames,
        encode_y4m,
        frame_luma_stats,
    )

    got = {(r.doc_id, r.frame_idx): (r.width, r.height, r.mean_y)
           for r in frame_luma_stats(attach_y4m_media(docs)).collect()}

    want = {}
    for row in docs.select("doc_id", "text").collect():
        w, h = row.doc_id % 3 * 2 + 4, row.doc_id % 2 * 2 + 2
        n_frames = row.doc_id % 4 + 1
        plane = w * h + 2 * (w * h // 4)
        seed = hashlib.md5((row.text or "").encode()).digest()
        stream = (seed * (plane * n_frames // 16 + 1))[: plane * n_frames]
        frames = [stream[f * plane:(f + 1) * plane] for f in range(n_frames)]
        for f in range(n_frames):
            y = list(frames[f][: w * h])
            want[(row.doc_id, f)] = (w, h, sum(y) // (w * h))
        # round-trip through the real decoder too
        assert decode_y4m_frames(encode_y4m(w, h, frames)) == [
            (f, w, h, want[(row.doc_id, f)][2]) for f in range(n_frames)
        ]

    assert got == want and len(got) > 500  # multi-frame fan-out

    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_y4m_frames(b"RIFF not y4m")


def test_dedup_clusters_transitive_and_keep_policy(docs, spark):
    """dedup_clusters: every doc labeled exactly once; clusters are closed
    under the pair relation (both ends of every pair share a cluster);
    exactly one keep per cluster = argmax (n_chars, -doc_id); singletons
    keep=true. Non-vacuous: the fixture must produce at least one multi-doc
    cluster (it seeds near-duplicate templates)."""
    from reden_spark.operators.curation import dedup_clusters
    from reden_spark.operators.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs, 3, 0.8)
    out = dedup_clusters(docs, pairs)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == docs.count()  # total assignment, each doc once

    plist = pairs.select("doc_a", "doc_b").collect()
    assert plist, "fixture produced no near-dup pairs — test is vacuous"
    for p in plist:
        assert rows[p["doc_a"]]["cluster_id"] == rows[p["doc_b"]]["cluster_id"]

    by_cluster: dict[int, list] = {}
    for r in rows.values():
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert any(len(m) > 1 for m in by_cluster.values())
    chars = {r["doc_id"]: r["n_chars"] for r in docs.select("doc_id", "n_chars").collect()}
    for cid, members in by_cluster.items():
        assert cid == min(m["doc_id"] for m in members)  # min-id label
        assert all(m["cluster_size"] == len(members) for m in members)
        kept = [m for m in members if m["keep"]]
        assert len(kept) == 1
        best = max(members, key=lambda m: (chars[m["doc_id"]], -m["doc_id"]))
        assert kept[0]["doc_id"] == best["doc_id"]


def test_stratified_sample_exact_counts(docs):
    """Exact per-stratum quota, deterministic across calls, sample is a
    hash-prefix (rank k implies ranks 1..k-1 present)."""
    from reden_spark.operators.curation import stratified_sample

    out = stratified_sample(docs, fraction=0.2, stratum_col="lang").collect()
    strata = {}
    for r in out:
        strata.setdefault(r["stratum"], []).append(r)
    totals = {r["lang"]: r["cnt"] for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    import math

    assert set(strata) == set(totals)  # every stratum sampled
    for s, members in strata.items():
        want = math.ceil(totals[s] * 0.2)
        assert len(members) == want
        assert sorted(m["sample_rank"] for m in members) == list(range(1, want + 1))
        assert all(m["n_take"] == want and m["n_stratum"] == totals[s] for m in members)
    again = stratified_sample(docs, fraction=0.2, stratum_col="lang").collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in out)


def test_tfidf_topk_ranks_and_scores(docs):
    """Top-3 per doc, rank-ordered by (tfidf desc, term asc); scores match a
    recomputation from raw tf/df; df consistent with term document frequency."""
    from reden_spark.operators.textstats import tfidf_topk

    import math

    n_docs = docs.count()
    out = tfidf_topk(docs, k=3).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for rs in per_doc.values():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        keys = [(-r["tfidf"], r["term"]) for r in rs]
        assert keys == sorted(keys)
        for r in rs:
            assert r["tfidf"] == round(r["tf"] * math.log(n_docs / r["df_docs"]), 6)


def test_pack_sequences_contiguous_offsets(docs):
    """Per shard: offsets are the running sum of token counts in doc_id order
    (contiguous stream, no gaps/overlaps) and seq_idx = start_offset // budget."""
    from reden_spark.operators.curation import pack_sequences

    out = pack_sequences(docs, budget=512, n_shards=8).collect()
    assert len(out) == docs.count()
    shards = {}
    for r in out:
        shards.setdefault(r["shard"], []).append(r)
    assert len(shards) > 1  # hashing actually spreads docs
    for members in shards.values():
        members.sort(key=lambda r: r["doc_id"])
        expect = 0
        for r in members:
            assert r["start_offset"] == expect
            assert r["seq_idx"] == r["start_offset"] // 512
            expect += r["n_tokens"]


def test_decontaminate_flags_exact_overlaps(docs):
    """contaminated <=> the doc shares >= 1 word 8-gram with the holdout,
    recomputed independently in Python; non-vacuous both ways (the fixture's
    near-dup templates split across the hash-sampled holdout)."""
    from reden_spark.operators.curation import decontaminate, stratified_sample

    import re

    samp_ids = {r["doc_id"] for r in stratified_sample(docs, 0.2, "lang").collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}

    def grams(t):
        words = [w for w in re.sub(r"\W+", " ", t.lower()).strip().split(" ") if w]
        return {" ".join(words[i : i + 8]) for i in range(len(words) - 7)}

    hold = set().union(*(grams(texts[i]) for i in samp_ids)) if samp_ids else set()
    train = docs.join(docs.sparkSession.createDataFrame([(i,) for i in samp_ids], "doc_id long"), "doc_id", "left_anti")
    out = {r["doc_id"]: r for r in decontaminate(train, docs.filter(F.col("doc_id").isin(samp_ids)), 8).collect()}
    assert set(out) == set(texts) - samp_ids  # full training assignment
    flagged = {i for i, r in out.items() if r["contaminated"]}
    expect = {i for i in out if grams(texts[i]) & hold}
    assert flagged == expect
    assert flagged and (set(out) - flagged)  # both classes present
    for i, r in out.items():
        assert r["n_hit_shingles"] == len(grams(texts[i]) & hold)


def test_curation_edge_cases(docs, spark):
    """Empty pair set -> every doc a kept singleton; fraction=1.0 -> the
    sample IS the corpus (exact quotas hold at the boundary)."""
    from reden_spark.operators.curation import dedup_clusters, stratified_sample

    empty_pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    out = dedup_clusters(docs, empty_pairs).collect()
    n = docs.count()
    assert len(out) == n
    assert all(r["keep"] and r["cluster_size"] == 1 and r["cluster_id"] == r["doc_id"] for r in out)

    full = stratified_sample(docs, fraction=1.0, stratum_col="lang").collect()
    assert len(full) == n
    assert all(r["n_take"] == r["n_stratum"] for r in full)


def test_ivf_pq_topk_shape_and_candidate_parity(emb):
    """IVF-PQ: dense ranks per query; the candidate SET (pre-quantization)
    equals ivf_topk's at the same (n_list, n_probe) when both rank the full
    candidate pool — quantization reorders within the pool but cannot invent
    or drop candidates. Recall vs exact asserted only as a sanity floor (PQ
    on random vectors is noisy by construction)."""
    from reden_spark.operators.similarity import cosine_topk, ivf_pq_topk, ivf_topk

    qids = [0, 1, 2, 3, 4]
    rows = ivf_pq_topk(emb, qids, k=5, n_list=8, n_probe=2).collect()
    by_q: dict[int, list[int]] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert set(by_q) == set(qids)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())

    # with k = corpus size, both IVF variants return the identical candidate
    # pool (same cells probed) — only the order differs
    big = 10_000
    pq_pool = {
        (r.query_id, r.neighbor_id)
        for r in ivf_pq_topk(emb, qids, k=big, n_list=8, n_probe=2).collect()
    }
    ivf_pool = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, qids, k=big, n_list=8, n_probe=2).collect()
    }
    assert pq_pool == ivf_pool

    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, qids, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in rows}
    assert len(exact & approx) / len(exact) > 0.05  # sanity floor only


def test_dedup_lazy_shared_mode_same_pairs(spark, monkeypatch):
    """REDEN_SHARED_SUBTREE=lazy must leave the dedup pair sets byte-identical
    (the dedup operators route their signature/shingle frames through
    checkpointing.shared() too, not just the links stage)."""
    from reden_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base_mh = sorted(map(tuple, minhash_lsh_pairs(docs, 12, 3, 4, 0.5).collect()))
    base_ng = sorted(map(tuple, ngram_jaccard_pairs(docs, 3, 0.8).collect()))
    monkeypatch.setenv("REDEN_SHARED_SUBTREE", "lazy")
    assert sorted(map(tuple, minhash_lsh_pairs(docs, 12, 3, 4, 0.5).collect())) == base_mh
    assert sorted(map(tuple, ngram_jaccard_pairs(docs, 3, 0.8).collect())) == base_ng
    assert base_mh and base_ng


def test_null_text_behaves_as_empty(spark, duck):
    """NULL text must flow through every text operator as '' on BOTH engines
    (round-4 ADVICE: un-coalesced size() yields NULL on the Spark side vs a
    NULL row in DuckDB — the fixtures have no NULL text, so this pins the
    hazard with an explicit one)."""
    from reden_spark.operators.dedup import exact_dedup
    from reden_spark.operators.textstats import (
        fingerprint,
        language_id,
        pretoken_count,
        quality_filter,
        quality_score,
        repetition_signals,
        token_count,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "the quick brown fox")], "doc_id long, text string"
    )

    def by_id(df):
        return {r["doc_id"]: tuple(r)[1:] for r in df.collect()}

    for op in (
        token_count,
        pretoken_count,
        quality_score,
        quality_filter,
        language_id,
        fingerprint,
        repetition_signals,
        exact_dedup,
    ):
        rows = op(docs).collect()
        # fingerprint's min_shingle_md5 is contractually NULL for sub-n docs
        # (the DuckDB oracle's CASE WHEN len(shingles) > 0 does the same)
        assert all(
            v is not None
            for r in rows
            for k, v in r.asDict().items()
            if k != "min_shingle_md5"
        ), (op.__name__, rows)
        if op is exact_dedup:
            # NULL and '' normalize identically -> one survivor for docs 1+2
            keys = {r.content_key: r.n_copies for r in rows}
            assert 2 in keys.values()
        else:
            got = by_id(op(docs))
            assert got[1] == got[2], (op.__name__, got[1], got[2])


def test_minhash_auto_salt_engages_on_boilerplate(spark):
    """A boilerplate-heavy corpus must arm the hot-band salt WITHOUT any caller
    flag (salt='auto' is the default) and the pair set must equal the unsalted
    plan's exactly (VERDICT r4 task #5)."""
    from reden_spark.operators import dedup
    from reden_spark.operators.dedup import auto_salt_for, minhash_lsh_pairs

    # pure-function decision rule
    assert auto_salt_for(100, cap=10_000) == 1
    assert auto_salt_for(10_001, cap=10_000) == 2
    assert auto_salt_for(1_000_000, cap=10_000) == 64  # bounded
    with pytest.raises(ValueError, match="hot_band_cap"):
        auto_salt_for(5, cap=0)  # CLI-reachable misconfiguration

    # 120 boilerplate clones (one giant band) + 60 distinct docs
    rows = [(i, "shared boilerplate header repeated across the corpus body") for i in range(120)]
    rows += [
        (1000 + i, f"unique document number {i} with its own words alpha{i} beta{i} gamma{i}")
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    base = sorted(
        map(tuple, minhash_lsh_pairs(docs, 12, 3, 4, 0.5, salt=1).collect())
    )
    auto = sorted(
        map(tuple, minhash_lsh_pairs(docs, 12, 3, 4, 0.5, hot_band_cap=50).collect())
    )
    assert dedup._LAST_AUTO_SALT is not None and dedup._LAST_AUTO_SALT > 1
    assert auto == base and len(base) >= 120 * 119 // 2  # every clone pair found

    # quiet corpus: the probe must leave the plan unsalted
    minhash_lsh_pairs(docs.filter("doc_id >= 1000"), 12, 3, 4, 0.5, hot_band_cap=50).collect()
    assert dedup._LAST_AUTO_SALT == 1


def test_url_extract_normalizes_hosts(spark):
    from reden_spark.operators.textstats import url_extract

    docs = spark.createDataFrame(
        [
            (0, "see https://WWW.Example.COM/a and http://example.com/b plus https://sub.www.org/c"),
            (1, "no urls here"),
            (2, None),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in url_extract(docs).collect()}
    # both example.com spellings normalize to ONE domain; sub.www.org keeps its
    # prefix (only a LEADING www. is stripped)
    assert got[0].n_urls == 3
    assert got[0].n_domains == 2
    assert got[0].domains == "example.com,sub.www.org"
    assert (got[1].n_urls, got[1].domains) == (0, "")
    assert (got[2].n_urls, got[2].domains) == (0, "")  # NULL text == empty


def test_domain_filter_blocklist_dedup_and_no_url_docs(spark):
    from reden_spark.operators.curation import domain_filter

    docs = spark.createDataFrame(
        [
            (0, "visit https://bad.example.net/x and https://good.org/y"),
            (1, "nothing to decide"),
        ],
        "doc_id long, text string",
    )
    # duplicated entries must not duplicate output rows, and blocklist
    # spellings normalize like the document side (case, leading www.)
    blocklist = spark.createDataFrame(
        [("WWW.Bad.Example.NET",), ("bad.example.net",)], "domain string"
    )
    rows = sorted(map(tuple, domain_filter(docs, blocklist).collect()))
    assert rows == [(0, "bad.example.net", True), (0, "good.org", False)]


def test_shuffle_deterministic_is_a_seeded_permutation(spark):
    from reden_spark.operators.curation import shuffle_deterministic

    docs = spark.createDataFrame([(i,) for i in range(257)], "doc_id long")
    a = {r.doc_id: r.position for r in shuffle_deterministic(docs, seed=1).collect()}
    # positions are exactly 1..n — the distributed-rank offsets are contiguous
    # across all 256 hash buckets (257 docs guarantee at least one collision)
    assert sorted(a.values()) == list(range(1, 258))
    # rerun is identical; a different seed is a different permutation
    a2 = {r.doc_id: r.position for r in shuffle_deterministic(docs, seed=1).collect()}
    b = {r.doc_id: r.position for r in shuffle_deterministic(docs, seed=2).collect()}
    assert a == a2
    assert sorted(b.values()) == list(range(1, 258)) and b != a
