"""Similarity search over the `embeddings` table (array<float> column).

* :func:`cosine_topk` — exact brute-force top-k neighbors for a query set,
  expressed with built-in higher-order functions (zip_with + aggregate — stays
  JVM-side, no Python). Baseline path; O(|Q| x |corpus|) but fully distributed
  (broadcast the query side).
* :func:`lsh_topk` — the scale path: random-hyperplane (sign) LSH buckets via a
  vectorized pandas UDF over Arrow batches; only same-bucket pairs are scored.
  Recall < 1 by construction; tests measure it against the exact baseline.

Outputs carry (rank, neighbor) rather than raw float scores so cross-engine
comparisons (DuckDB oracle) are immune to last-ulp float drift.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

#: Embedding width of the synthetic fixtures (TESTDATA.md `embeddings.parquet`).
#: Shared by the Spark queries and their DuckDB oracle twins so hyperplane
#: generation (dim-dependent RandomState fill) can never silently diverge
#: between engines on a different-width fixture.
EMB_DIM = 64


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return dot / (na * nb)


def cosine_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5) -> DataFrame:
    """Exact top-k by cosine: (query_id, rank, neighbor_id). Self-matches excluded;
    ties broken by neighbor_id ascending (deterministic)."""
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = embeddings.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(_cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_bucket_udf(dim: int, n_planes: int = 8, seed: int = 7):
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf(IntegerType())
    def bucket(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())
        signs = (mat @ planes.T) > 0
        vals = (signs * (1 << np.arange(n_planes))).sum(axis=1)
        return pd.Series(vals.astype(np.int32))

    return bucket


def lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 6,
    seed: int = 7,
    bucketer: str = "codegen",
) -> DataFrame:
    """Approximate top-k: score only within the query's hyperplane-sign bucket.

    ``bucketer='codegen'`` (default) computes buckets with integer-valued
    hyperplanes as pure Column expressions (:func:`signlsh_bucket_col`) — stays
    in whole-stage codegen AND is exactly reproducible in DuckDB, which is what
    gives this query a full value-hash oracle. ``bucketer='udf'`` keeps the
    Arrow-batched numpy float-hyperplane variant for very high dim x n_planes
    where a vectorized matmul beats per-plane fold expressions."""
    dim = len(embeddings.select("embedding").first()[0])
    if bucketer == "codegen":
        e = embeddings.withColumn(
            "bucket", signlsh_bucket_col(F.col("embedding"), dim, n_planes, seed)
        )
    else:
        bucket = lsh_bucket_udf(dim, n_planes, seed)
        e = embeddings.withColumn("bucket", bucket(F.col("embedding")))
    q = e.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "bucket"
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"), "bucket")
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(_cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def _nearest_cells(vectors: DataFrame, centroids: DataFrame, n_probe: int) -> DataFrame:
    """Per vector: the n_probe most-cosine-similar centroid cells (ties -> lower
    cid). Centroid side is broadcast; scoring stays JVM-side (zip_with/aggregate)
    so the arithmetic is reproducible against the SQL oracle."""
    w = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cid"))
    return (
        vectors.crossJoin(F.broadcast(centroids))
        .withColumn("csim", F.round(_cosine(F.col("embedding"), F.col("cvec")), 6))
        .withColumn("crn", F.row_number().over(w))
        .filter(F.col("crn") <= n_probe)
        .drop("cvec", "csim", "crn")
    )


def train_centroids(
    embeddings: DataFrame, n_list: int, iters: int
) -> DataFrame:
    """Deterministic Lloyd refinement of the first-n_list init centroids.

    Each iteration: assign every vector to its nearest centroid (broadcast
    crossJoin — one scan), then recompute each cell's element-wise mean
    relationally (posexplode + groupBy(cid, pos) avg). The new centroid table
    (n_list x dim values) is collected to the driver and re-broadcast — the
    standard IVF training shape: corpus-size work stays distributed, only the
    centroid table (KBs) round-trips. No RNG anywhere; init = lowest vec_ids,
    ties in assignment break toward the lower cid, so results are stable
    across runs and partitionings.

    Each iteration's per-cell means are **quantized to 6 decimals** (the same
    determinism trick as eigenvector_scores): float sum-order drift between
    engines/partitionings lives ~10 ulp below the quantum, so the trained
    centroids — and therefore every downstream assignment — are exactly
    reproducible in DuckDB, giving `ann_ivf_trained` a full value-hash oracle.
    """
    cent = (
        embeddings.orderBy("vec_id")
        .limit(n_list)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
    )
    for _ in range(iters):
        assigned = _nearest_cells(embeddings, cent, 1)
        means = (
            assigned.select("cid", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cid", F.col("pm.m").alias("cvec"))
        )
        rows = means.collect()  # n_list rows — the tiny centroid table only
        spark = embeddings.sparkSession
        cent = spark.createDataFrame(
            [(int(r.cid), [float(x) for x in r.cvec]) for r in rows],
            # doubles, not floats: float32 re-quantization would undo the
            # 6-decimal rounding that makes the centroids engine-portable
            "cid int, cvec array<double>",
        )
    return cent


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_list: int = 8,
    n_probe: int = 2,
    train_iters: int = 0,
) -> DataFrame:
    """IVF (inverted-file) ANN — the coarse-quantizer scale path.

    Build: pick n_list deterministic coarse centroids (the n_list lowest vec_ids
    — reproducible, no RNG), assign every corpus vector to its nearest centroid
    cell (one shuffle on cid). Probe: each query scores only the vectors in its
    n_probe nearest cells, i.e. the classic IVF candidate cut. At cluster scale
    the cell assignment is computed once and persisted (partitioned by cid), so
    a query touches n_probe/n_list of the corpus instead of all of it; the
    per-cell join key makes the probe a co-partitioned equi-join rather than the
    brute-force crossJoin of :func:`cosine_topk`. Recall < 1 by construction;
    tests measure it against the exact baseline.

    ``train_iters > 0`` refines the init centroids with deterministic Lloyd
    iterations (:func:`train_centroids`) — better-balanced cells on real
    corpora; the default 0 keeps the first-n quantizer whose DuckDB oracle is
    exact.
    """
    cent = train_centroids(embeddings, n_list, train_iters)
    assigned = _nearest_cells(embeddings, cent, 1).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"), "cid"
    )
    probes = _nearest_cells(
        embeddings.filter(F.col("vec_id").isin(query_ids)), cent, n_probe
    ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "cid")
    scored = (
        probes.join(assigned, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(_cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def _l2sq(a, b):
    """Squared L2 distance as a sequential JVM-side fold — index-ordered in
    both engines (Spark `aggregate`, DuckDB `list_sum`), so rounded results
    are bit-identical across them."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_list: int = 8,
    n_probe: int = 2,
    m: int = 4,
    n_codes: int = 8,
) -> DataFrame:
    """IVF-PQ ANN — the memory-compressed scale path (Jégou et al., TPAMI'11
    shape): coarse IVF cells cut the candidate set, and product-quantized
    codes replace raw vectors in the scan.

    Build: the first-`n_list` coarse centroids assign every vector to a cell
    (as :func:`ivf_topk`); each vector is then ENCODED as `m` codebook ids —
    the embedding splits into m subvectors, and per subspace the codebook is
    the subvectors of the first `n_codes` corpus vectors (deterministic init,
    no RNG; distances quantized to 6 decimals before the argmin so the codes
    are engine-portable). The corpus representation shrinks from dim floats
    to m small ints per vector — at 100 TB the code table is what stays hot.

    Probe (ADC — asymmetric distance computation): a query computes one
    m x n_codes table of squared L2 distances to every codeword, then each
    candidate's approximate distance is m table lookups summed in FIXED
    subspace order (broadcast joins on (query_id, code); no float-sum-order
    nondeterminism), over the `n_probe` nearest cells only. Ranking ascends
    (adist, neighbor_id). Recall < 1 twice over (cell cut + quantization);
    tests measure it against the exact baseline, and the DuckDB oracle
    restates the entire build+probe exactly.
    """
    dim = len(embeddings.select("embedding").first()[0])
    if dim % m:
        raise ValueError(f"embedding width {dim} not divisible by m={m} subspaces")
    sw = dim // m
    spark = embeddings.sparkSession

    # same deterministic coarse quantizer as ivf_topk (train_centroids with 0
    # Lloyd iterations = the first-n_list init) — shared so the two IVF
    # variants can never silently probe different cells
    cent = train_centroids(embeddings, n_list, 0)
    assigned = _nearest_cells(embeddings, cent, 1)

    # codebooks: subvectors of the first n_codes vectors; tiny (m x n_codes
    # rows) — the only data that touches the driver (collect order is the
    # plan's orderBy)
    first = embeddings.orderBy("vec_id").limit(n_codes).collect()
    cw = spark.createDataFrame(
        [
            (s, code, [float(x) for x in r.embedding[s * sw : (s + 1) * sw]])
            for code, r in enumerate(first)
            for s in range(m)
        ],
        "sub int, code int, cwvec array<double>",
    )

    def sub_slices(col):
        return F.posexplode(F.array(*[F.slice(col, s * sw + 1, sw) for s in range(m)]))

    # encode the corpus: per (vector, subspace) the nearest codeword
    enc = (
        assigned.select("vec_id", "cid", sub_slices(F.col("embedding")).alias("sub", "subv"))
        .join(F.broadcast(cw), "sub")
        .withColumn("dist", F.round(_l2sq(F.col("subv"), F.col("cwvec")), 6))
        .groupBy("vec_id", "cid", "sub")
        .agg(F.min(F.struct("dist", "code")).alias("best"))
    )
    codes = enc.groupBy("vec_id", "cid").agg(
        *[
            F.min(F.when(F.col("sub") == s, F.col("best.code"))).alias(f"c{s}")
            for s in range(m)
        ]
    )

    # per-query ADC distance tables (m x n_codes rows per query, broadcast)
    q = embeddings.filter(F.col("vec_id").isin(query_ids))
    dt = (
        q.select(F.col("vec_id").alias("query_id"), sub_slices(F.col("embedding")).alias("sub", "qsubv"))
        .join(F.broadcast(cw), "sub")
        .withColumn("qd", F.round(_l2sq(F.col("qsubv"), F.col("cwvec")), 6))
        .select("query_id", "sub", "code", "qd")
    )

    probes = _nearest_cells(q, cent, n_probe).select(
        F.col("vec_id").alias("query_id"), "cid"
    )
    cand = (
        probes.join(codes, "cid")
        .withColumnRenamed("vec_id", "neighbor_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    for s in range(m):
        dts = dt.filter(F.col("sub") == s).select(
            "query_id", F.col("code").alias(f"c{s}"), F.col("qd").alias(f"qd{s}")
        )
        cand = cand.join(F.broadcast(dts), ["query_id", f"c{s}"])
    adist = F.round(sum(F.col(f"qd{s}") for s in range(m)), 6)
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("neighbor_id"))
    return (
        cand.withColumn("adist", adist)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def int_hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    """Integer-valued sign-LSH hyperplanes in [-4, 4]. Integer weights keep the
    dot products exactly representable, so the identical formula evaluates to
    the same sign in Spark and DuckDB — which is what makes
    :func:`pairwise_dup_candidates` fully oracle-checkable."""
    rng = np.random.RandomState(seed)
    return rng.randint(-4, 5, size=(n_planes, dim))


def signlsh_bucket_col(col, dim: int, n_planes: int = 4, seed: int = 7):
    """Sign-LSH bucket id as a pure Column expression (zip_with + aggregate —
    JVM-side whole-stage codegen, no Python in the hot path). For very high
    dim x n_planes the Arrow-batched :func:`lsh_bucket_udf` is the vectorized
    alternative; at typical embedding widths the codegen form wins and is
    engine-portable."""
    planes = int_hyperplanes(dim, n_planes, seed)
    total = F.lit(0)
    for p in range(n_planes):
        arr = F.array(*[F.lit(float(w)) for w in planes[p]])
        dot = F.aggregate(
            F.zip_with(col, arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        total = total + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return total


def signlsh_bucket_sql(expr: str, dim: int, n_planes: int = 4, seed: int = 7) -> str:
    """The DuckDB twin of :func:`signlsh_bucket_col` (same planes, same fold)."""
    planes = int_hyperplanes(dim, n_planes, seed)
    terms = []
    for p in range(n_planes):
        lits = ", ".join(str(float(w)) for w in planes[p])
        dot = (
            f"list_sum(list_transform(list_zip({expr}, [{lits}]), p -> p[1]::DOUBLE * p[2]))"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def pairwise_dup_candidates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 4,
    seed: int = 7,
    expect_dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via sign-LSH blocking (the
    embedding twin of dedup.minhash_lsh_pairs): only same-bucket pairs are
    scored, then verified with the exact cosine. Bucketing and verification
    are both pure Column expressions, mirrored 1:1 by the DuckDB oracle.

    ``expect_dim``: when given (the driver contract passes :data:`EMB_DIM`),
    raise loudly if the data's width differs — int_hyperplanes' RandomState
    fill is dim-dependent, so a silent width mismatch would generate entirely
    different hyperplanes on the Spark and oracle sides."""
    dim = len(embeddings.select("embedding").first()[0])
    if expect_dim is not None and dim != expect_dim:
        raise ValueError(
            f"embedding width {dim} != expected {expect_dim}; the SQL oracle's "
            "hyperplanes are generated for the expected width — update EMB_DIM"
        )
    e = embeddings.withColumn(
        "bucket", signlsh_bucket_col(F.col("embedding"), dim, n_planes, seed)
    )
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"), "bucket")
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(_cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
