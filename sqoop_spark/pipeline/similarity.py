"""Similarity search over embedding columns (array<float>).

- ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query
  set against the corpus, dot products via ``F.zip_with`` + ``F.aggregate``
  in double precision (JVM-side, no UDF), rank with one window per query.
  The baseline every ANN variant is verified against.
- ``lsh_cosine_topk`` — random-hyperplane LSH: H deterministic seeded
  hyperplanes (components derived from xxhash64, so executors regenerate
  them without a broadcast of real data), bucket = sign-bit signature;
  search only within the query's bucket (plus optional multi-probe of
  Hamming-1 neighbors). At 10^9 vectors the bucket join replaces the full
  cross product — the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus.

    Returns (query_id, neighbor_id, rank, cosine). Self-matches excluded.
    The query side is broadcast — top-k search with a small query set is a
    map-only pass over the corpus followed by one per-query window.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("_qv"), F.col("_cv")) / (_norm(F.col("_qv")) * _norm(F.col("_cv")))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _signature(vec, dim: int, n_planes: int, seed: int):
    """Sign-bit signature under deterministic pseudo-random hyperplanes.

    Plane p's component j = xxhash64(seed, p, j) scaled to [-1, 1). The
    planes are regenerated from (seed, p, j) wherever needed — nothing to
    broadcast, which matters when the plan is shipped to 1000 executors.
    """
    bits = []
    for p in range(n_planes):
        comp = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, j: x.cast("double")
                * (
                    (
                        F.pmod(
                            F.xxhash64(F.lit(seed), F.lit(p), j), F.lit(2_000_000)
                        ).cast("double")
                        / F.lit(1_000_000.0)
                    )
                    - F.lit(1.0)
                ),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(comp >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**p))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 4,
    seed: int = 42,
    n_probes: int = 1,
) -> DataFrame:
    """Approximate cosine top-k: search the query's LSH bucket, plus —
    with ``n_probes > 1`` — its Hamming-1 neighbor buckets (multi-probe).

    Recall < 1 by design (verified against ``cosine_topk`` in tests);
    with B buckets the joined volume drops ~B× — the path that survives a
    10^9-vector corpus where brute force cannot. Multi-probe recovers the
    recall cliff of small ``n_planes``: a vector near a hyperplane lands
    on either side, so probing the buckets one bit-flip away (query-side
    fan-out only, corpus untouched) trades k-fold candidate volume for
    recall without growing the index. ``n_probes`` buckets are probed per
    query: the home bucket first, then bit-flip neighbors of planes
    0..n_probes-2 (probing all Hamming-1 neighbors = n_planes + 1).
    """
    n_probes = max(1, min(n_probes, n_planes + 1))
    sig = lambda df, idname: df.select(  # noqa: E731
        F.col(id_col).alias(idname),
        F.col(vec_col).alias(f"_{idname}_v"),
        _signature(F.col(vec_col), dim, n_planes, seed).alias(f"_{idname}_sig"),
    )
    qbase = sig(queries, "query_id")
    # Query-side probe fan-out: home bucket + Hamming-1 neighbors. The
    # corpus side keeps exactly one bucket per vector.
    probes = F.array(
        F.col("_query_id_sig"),
        *[
            F.col("_query_id_sig").bitwiseXOR(F.lit(2**p))
            for p in range(n_probes - 1)
        ],
    )
    q = F.broadcast(
        qbase.withColumn("_probe_sig", F.explode(probes)).drop("_query_id_sig")
    )
    c = sig(corpus, "neighbor_id")
    scored = (
        q.join(c, F.col("_probe_sig") == F.col("_neighbor_id_sig"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("_query_id_v"), F.col("_neighbor_id_v"))
                / (_norm(F.col("_query_id_v")) * _norm(F.col("_neighbor_id_v")))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
