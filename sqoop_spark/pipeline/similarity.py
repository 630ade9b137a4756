"""Similarity search & embedding dedup over embedding columns (array<float>).

- ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query
  set against the corpus, dot products via ``F.zip_with`` + ``F.aggregate``
  in double precision (JVM-side, no UDF), rank with one window per query.
  The baseline every ANN variant is verified against.
- ``lsh_cosine_topk`` — random-hyperplane LSH: H deterministic seeded
  hyperplanes (components derived from xxhash64 or a DuckDB-portable
  sha256 hash, so executors regenerate them without a broadcast of real
  data), bucket = sign-bit signature; search only within the query's
  bucket (plus optional multi-probe of Hamming-1 neighbors). At 10^9
  vectors the bucket join replaces the full cross product — the scale path.
- ``embedding_dedup_pairs`` — embedding-cosine NEAR-DUP JOIN (all pairs
  with cosine ≥ threshold): candidates from the same hyperplane-bucket
  self-join, verified with the exact cosine. Near-duplicate vectors agree
  on almost every sign bit, so bucket-equality recall is high exactly in
  the regime dedup cares about (cosine → 1), while the join volume stays
  sum-of-squared-bucket-sizes instead of N².
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


def _pair_cosine_udf():
    """Arrow-vectorized exact cosine of two array columns: one numpy batch
    (row-wise einsum dot + norms) per Arrow batch.

    Catalyst evaluates higher-order functions (``F.aggregate``/``zip_with``)
    per-element WITHOUT codegen, so the expr cosine pays ~dim interpreted
    ops per candidate pair — measurably the slowest part of the bucketed
    ANN/dedup verifies at bench scale. This is the same dense-linear-algebra
    workload as IVF's ``_make_top_cents_udf``: one BLAS-backed batch op
    replaces millions of expression-tree evaluations. Numerically the two
    paths agree to ~1e-15 relative (double arithmetic, different summation
    order), pytest-pinned at the 6-decimal rounding every consumer applies.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _cos(a, b):
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack([np.asarray(x, dtype="float64") for x in a])
        B = np.stack([np.asarray(x, dtype="float64") for x in b])
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(num / den)

    return pandas_udf(_cos, "double")


def _cosine_col(a, b, method: str):
    """Exact pair cosine as a Column: ``method="pandas"`` (Arrow/BLAS fast
    path, default everywhere) or ``"expr"`` (pure-Catalyst higher-order
    functions — the DuckDB-translatable twin, pytest-pinned equal)."""
    if method == "pandas":
        return _pair_cosine_udf()(a, b)
    if method == "expr":
        return _dot(a, b) / (_norm(a) * _norm(b))
    raise ValueError(f"unknown cosine method {method!r}; use 'pandas' or 'expr'")


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "pandas",
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus.

    Returns (query_id, neighbor_id, rank, cosine). Self-matches excluded.
    The query side is broadcast — top-k search with a small query set is a
    map-only pass over the corpus followed by one per-query window.
    ``method``: see ``_cosine_col``.
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
            _cosine_col(F.col("_qv"), F.col("_cv"), method).alias("cosine"),
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


def cosine_topk_blas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k, the map-side-combine shape: the
    (small, bounded) query set is collected once and broadcast as one
    normalized matrix; each corpus Arrow batch computes the full
    ``batch × queryᵀ`` cosine block with one BLAS matmul and emits only
    its per-query top-k candidates — ~``n_queries × k`` rows per batch
    instead of ``n_queries × batch`` join rows, so the shuffle is O(k)
    per query per batch and the corpus vectors never leave the executor.

    Same result as ``cosine_topk`` (pytest-pinned): candidate selection
    uses the global (-cosine, neighbor_id) total order within each batch,
    and any element of the global top-k under that order is necessarily
    in its own batch's top-k under the same order — so per-batch k is
    exact, no slack needed. Use this at 10^9 × 10^2; ``cosine_topk``'s
    pair-join stays for oracle parity and tiny inputs.
    """
    import numpy as np

    spark = corpus.sparkSession
    id_type = dict(corpus.dtypes)[id_col]
    qrows = queries.select(id_col, vec_col).collect()
    if not qrows:
        # the pair-join twin returns empty here; np.stack([]) would raise.
        # Types come from the CORPUS, same as the non-empty path — the
        # schema must not flip with the row count.
        return spark.createDataFrame(
            [],
            f"query_id {id_type}, neighbor_id {id_type}, "
            "rank int, cosine double",
        )
    qids = [r[0] for r in qrows]
    Q = np.stack([np.asarray(r[1], dtype="float64") for r in qrows])
    bc = spark.sparkContext.broadcast((qids, Q, np.linalg.norm(Q, axis=1)))
    out_schema = (
        f"query_id {id_type}, neighbor_id {id_type}, cosine double"
    )

    def _gen(batches):
        import pandas as pd

        ids_q, m, mnorm = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            nids = pdf[id_col].to_numpy()
            V = np.stack([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            # dot / (|v| * |q|), the _pair_cosine_udf op order (one divide
            # of the raw dot by the norm product)
            S = (V @ m.T) / np.outer(np.linalg.norm(V, axis=1), mnorm)
            take = min(k + 1, len(nids))  # +1 absorbs a self-match
            parts = []
            for qi in range(len(ids_q)):
                col = S[:, qi]
                # exact under the (-cosine, id) total order: lexsort keys
                # are applied last-key-major
                order = np.lexsort((nids, -col))[:take]
                parts.append(
                    pd.DataFrame(
                        {
                            "query_id": ids_q[qi],
                            "neighbor_id": nids[order],
                            "cosine": col[order],
                        }
                    )
                )
            yield pd.concat(parts, ignore_index=True)

    cand = corpus.mapInPandas(_gen, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _plane_component(j, p: int, seed: int, hash_fn: str):
    """Plane p's pseudo-random component at index j, scaled to [-1, 1).

    "xxhash64" is the JVM fast path; "sha256" derives the same-shaped
    value from the first 15 hex chars of sha256("<seed>|<p>|" + j) — a
    hash DuckDB computes identically, giving the LSH driver query a full
    value-hash oracle (see __spark_entry__.oracle_sql)."""
    if hash_fn == "xxhash64":
        h = F.pmod(F.xxhash64(F.lit(seed), F.lit(p), j), F.lit(2_000_000))
    else:
        h = (
            F.conv(
                F.substring(
                    F.sha2(
                        F.concat(F.lit(f"{seed}|{p}|"), j.cast("string")), 256
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % F.lit(2_000_000)
        )
    return (h.cast("double") / F.lit(1_000_000.0)) - F.lit(1.0)


def _plane_components_py(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """The sha256-mode hyperplane components, computed driver-side with
    hashlib — bit-identical to the Spark expression
    ``conv(substring(sha2('<seed>|<p>|<j>', 256), 1, 15), 16, 10) % 2000000
    / 1e6 - 1`` (both are an exact IEEE parse of the same integer; pinned by
    ``test_signature_sql_matches_column_expr``), so the DuckDB oracle keeps
    recomputing the very same planes while the Spark plan carries only
    literal doubles."""
    import hashlib

    return [
        [
            int(hashlib.sha256(f"{seed}|{p}|{j}".encode()).hexdigest()[:15], 16)
            % 2_000_000
            / 1_000_000.0
            - 1.0
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]


def _signature_sql(
    vec_sql: str, dim: int, n_planes: int, seed: int, hash_fn: str = "xxhash64"
) -> str:
    """The signature as ONE SQL string. Building it as nested Column ops
    costs dim × n_planes × ~8 py4j round-trips PER SIDE (~7 s of driver
    wall for dim=64, measured) — string assembly is pure Python and the
    JVM parses it once. sha256 components are hashlib-precomputed literals
    (exact parity, see ``_plane_components_py``); xxhash64 components stay
    as expression text over literal indices, which Catalyst constant-folds
    to one literal array at plan time exactly as before (pinned by
    ``test_signature_planes_constant_folded``)."""
    if hash_fn == "sha256":
        comp_arrays = [
            "array(" + ", ".join(f"CAST('{v!r}' AS DOUBLE)" for v in comps) + ")"
            for comps in _plane_components_py(dim, n_planes, seed)
        ]
    elif hash_fn == "xxhash64":
        comp_arrays = [
            "array("
            + ", ".join(
                f"(CAST(pmod(xxhash64({seed}, {p}, {j}), 2000000) AS DOUBLE)"
                f" / CAST('1000000.0' AS DOUBLE) - CAST('1.0' AS DOUBLE))"
                for j in range(dim)
            )
            + ")"
            for p in range(n_planes)
        ]
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}; use 'xxhash64' or 'sha256'")
    terms = []
    for p, arr in enumerate(comp_arrays):
        dot = (
            f"aggregate(zip_with({vec_sql}, {arr}, (x, c) -> CAST(x AS DOUBLE) * c), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {2 ** p} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _signature(
    vec_col: str, dim: int, n_planes: int, seed: int, hash_fn: str = "xxhash64"
):
    """Sign-bit signature under deterministic pseudo-random hyperplanes.

    Plane p's component j is derived from (seed, p, j) — the planes are
    regenerated wherever needed, nothing to broadcast, which matters when
    the plan is shipped to 1000 executors. Per row the executors do only
    the multiply-add fold over a literal component array, never
    dim × n_planes hashes. ``vec_col`` is the column NAME: the whole
    expression is assembled as SQL text (see ``_signature_sql``) so the
    driver pays one py4j call instead of thousands.
    """
    return F.expr(_signature_sql(f"`{vec_col}`", dim, n_planes, seed, hash_fn))


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
    hash_fn: str = "xxhash64",
    method: str = "pandas",
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
        _signature(vec_col, dim, n_planes, seed, hash_fn).alias(
            f"_{idname}_sig"
        ),
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
            _cosine_col(
                F.col("_query_id_v"), F.col("_neighbor_id_v"), method
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


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic IVF coarse quantizer: the ``n_centroids`` corpus rows
    with the smallest seeded hash of their id become centroids 0..K-1
    (hash order, id tie-break). A hash-ordered draw is a uniform sample,
    so the centroid set tracks the data distribution the way k-means
    seeding does — with no iterative pass and bitwise determinism on any
    cluster. ``orderBy().limit()`` plans as a distributed top-K
    (TakeOrderedAndProject), not a global sort, so selection stays O(K)
    per partition at 10^9 vectors. ``hash_fn="sha256"`` makes the choice
    DuckDB-reproducible for the driver oracle. (The reference samples the
    key space the same way to carve even work units:
    mapreduce/db/IntegerSplitter.java:39-186.)
    """
    from sqoop_spark.pipeline.dedup import _hash64

    h = _hash64(F.col(id_col).cast("string"), seed, hash_fn)
    top = (
        corpus.select(
            F.col(id_col).alias("_cvid"), F.col(vec_col).alias("_kv"), h.alias("_h")
        )
        .orderBy("_h", "_cvid")
        .limit(n_centroids)
    )
    w = Window.orderBy("_h", "_cvid")
    return top.withColumn(
        "centroid_id", (F.row_number().over(w) - 1).cast("int")
    ).select("centroid_id", "_kv")


def _centroid_cos(vec, kv):
    return _dot(vec, kv) / (_norm(vec) * _norm(kv))


def _make_top_cents_udf(spark, cents_rows, n_best: int):
    """Arrow-vectorized nearest-centroid assignment: one numpy/BLAS
    ``batch × centroidᵀ`` matrix multiply per Arrow batch against the
    broadcast row-normalized centroid matrix. Returns the ``n_best``
    nearest centroid ids, ties to the smaller id (stable argsort over
    id-ordered columns). This is dense linear algebra — exactly the
    workload where a pandas UDF beats per-row JVM expression trees."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cmat = np.stack(
        [np.asarray(r, dtype="float64") for r in cents_rows]
    )  # rows already in centroid_id order 0..K-1
    cn = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast(cn)

    def _top_cents(vs):
        m = bc.value
        out = []
        V = np.stack([np.asarray(v, dtype="float64") for v in vs])
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        S = V @ m.T  # (batch, K) cosine matrix
        if n_best == 1:
            # argmax returns the FIRST maximum — the same smallest-id
            # tie-break as the stable argsort, at O(K) per row instead of
            # O(K log K): this is the index-build hot path at K=10^4.
            for c in np.argmax(S, axis=1):
                out.append([int(c)])
        else:
            order = np.argsort(-S, axis=1, kind="stable")[:, :n_best]
            for row in order:
                out.append(row.astype("int32").tolist())
        return pd.Series(out)

    return pandas_udf(_top_cents, "array<int>")


def ivf_index(
    corpus: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    hash_fn: str = "xxhash64",
    method: str = "expr",
) -> tuple[DataFrame, DataFrame]:
    """IVF build phase, separable so the inverted index is PAID ONCE and
    reused across query batches (the IVF contract). Returns
    ``(cents, index)``: the centroid table (centroid_id, _kv) and the
    assignment index (neighbor_id, _cv, centroid_id). Persist/checkpoint
    ``index`` between query batches; see ``ivf_cosine_topk`` for the
    assignment-method trade-off (``expr`` crossjoin vs ``pandas`` BLAS)."""
    cents_df = ivf_centroids(corpus, n_centroids, id_col, vec_col, seed, hash_fn)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    if method == "pandas":
        # Bounded driver collect (K rows, id-ordered) -> broadcast matrix.
        rows = cents_df.orderBy("centroid_id").collect()
        assign1 = _make_top_cents_udf(
            corpus.sparkSession, [r["_kv"] for r in rows], 1
        )
        index = c.withColumn("centroid_id", assign1(F.col("_cv"))[0])
    elif method == "expr":
        cents = F.broadcast(cents_df)
        index = (
            c.crossJoin(cents)
            .select(
                "neighbor_id",
                "_cv",
                "centroid_id",
                _centroid_cos(F.col("_cv"), F.col("_kv")).alias("_ccos"),
            )
            .groupBy("neighbor_id")
            .agg(
                F.max_by(
                    "centroid_id", F.struct(F.col("_ccos"), (-F.col("centroid_id")))
                ).alias("centroid_id"),
                F.first("_cv").alias("_cv"),
            )
        )
    else:
        raise ValueError(f"unknown method {method!r}; use 'expr' or 'pandas'")
    return cents_df, index


def ivf_search(
    cents_df: DataFrame,
    index: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 2,
    method: str = "expr",
    verify_method: str = "pandas",
) -> DataFrame:
    """IVF query phase over a prebuilt ``ivf_index``: each query probes
    its ``n_probes`` nearest centroids' inverted lists only; the probe
    side broadcasts, so the (large) index is never re-shuffled."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    if method == "pandas":
        rows = cents_df.orderBy("centroid_id").collect()
        assignp = _make_top_cents_udf(
            queries.sparkSession, [r["_kv"] for r in rows], n_probes
        )
        probes = q.withColumn(
            "centroid_id", F.explode(assignp(F.col("_qv")))
        ).select("query_id", "_qv", "centroid_id")
    elif method == "expr":
        wq = Window.partitionBy("query_id").orderBy(
            F.col("_ccos").desc(), F.col("centroid_id").asc()
        )
        probes = (
            q.crossJoin(F.broadcast(cents_df))
            .select(
                "query_id",
                "_qv",
                "centroid_id",
                _centroid_cos(F.col("_qv"), F.col("_kv")).alias("_ccos"),
            )
            .withColumn("_pr", F.row_number().over(wq))
            .filter(F.col("_pr") <= n_probes)
            .select("query_id", "_qv", "centroid_id")
        )
    else:
        raise ValueError(f"unknown method {method!r}; use 'expr' or 'pandas'")
    scored = (
        index.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cosine_col(F.col("_qv"), F.col("_cv"), verify_method).alias("cosine"),
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


def ivf_store_index(
    cents_df: DataFrame, index: DataFrame, path: str
) -> None:
    """Persist an ``ivf_index`` PARTITIONED BY CENTROID — the layout that
    converts IVF's candidate pruning into file pruning: each centroid's
    inverted list is one parquet directory (repartition by centroid first,
    so each list is a single file, not one shard per writer task), and a
    probe-time ``centroid_id IN (...)`` filter prunes every unprobed list
    at the FILE level (PartitionFilters — the scan never opens them).
    This is the 10^9-vector deployment shape: an in-memory index is always
    fully scanned by the probe join (see ``bench.py ivf_large_k``'s
    crossover note); a stored, centroid-partitioned index reads only
    ``n_probes/K`` of the corpus from disk. Centroids land next to the
    lists under ``<path>.centroids``."""
    (
        index.repartition("centroid_id")
        .write.partitionBy("centroid_id")
        .mode("overwrite")
        .parquet(path)
    )
    cents_df.write.mode("overwrite").parquet(f"{path}.centroids")


def ivf_search_stored(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 2,
    verify_method: str = "pandas",
) -> DataFrame:
    """IVF query over a STORED centroid-partitioned index
    (``ivf_store_index``): the probed centroid ids are computed first (a
    bounded queries × n_probes set), pushed as a partition filter, and the
    scan opens only the probed inverted-list files. Results are identical
    to ``ivf_search`` on the in-memory index (pytest-pinned)."""
    cents_df = spark.read.parquet(f"{path}.centroids")
    rows = cents_df.orderBy("centroid_id").collect()
    if not rows:
        # an index with zero centroids is broken storage, not an empty
        # answer — stay loud (distinct from the empty-QUERY branch below)
        raise ValueError(
            f"ivf_search_stored: no centroids stored under {path}.centroids"
        )
    assignp = _make_top_cents_udf(spark, [r["_kv"] for r in rows], n_probes)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    probes = q.withColumn(
        "centroid_id", F.explode(assignp(F.col("_qv")))
    ).select("query_id", "_qv", "centroid_id")
    probed = sorted(
        r["centroid_id"]
        for r in probes.select("centroid_id").distinct().collect()
    )
    if not probed:  # empty QUERY set probes nothing — empty result, with
        # the same column types as the non-empty path: query_id from the
        # queries frame, neighbor_id from the stored lists' footer schema
        # (one footer read via the first list directory — not a full
        # partition discovery over all K directories)
        q_type = dict(queries.dtypes)[id_col]
        jvm = spark._jvm
        root = jvm.org.apache.hadoop.fs.Path(path)
        fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
        first = sorted(
            st.getPath().getName()
            for st in fs.listStatus(root)
            if st.getPath().getName().startswith("centroid_id=")
        )
        if not first:
            raise ValueError(
                f"ivf_search_stored: no inverted lists stored under {path}"
            )
        n_type = dict(
            spark.read.option("basePath", path)
            .parquet(f"{path}/{first[0]}")
            .dtypes
        )["neighbor_id"]
        return spark.createDataFrame(
            [],
            f"query_id {q_type}, neighbor_id {n_type}, "
            "rank int, cosine double",
        )
    # Open ONLY the probed lists' directories (with basePath so the
    # partition column survives): Spark's partition discovery over the
    # whole index root lists all K directories — at K=4096 that listing
    # dominated the query wall 5× over the actual scan. One driver-side
    # listStatus of the root (a single RPC) guards against inverted lists
    # that were never written (a duplicate-vector centroid can absorb
    # another's list), then the scan's file index is O(probes), not O(K).
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    existing = {st.getPath().getName() for st in fs.listStatus(root)}
    dirs = [
        f"{path}/centroid_id={c}"
        for c in probed
        if f"centroid_id={c}" in existing
    ]
    if not dirs:
        raise ValueError(
            f"ivf_search_stored: none of the probed centroids {probed} "
            f"have stored inverted lists under {path}"
        )
    index = spark.read.option("basePath", path).parquet(*dirs)
    scored = (
        index.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cosine_col(F.col("_qv"), F.col("_cv"), verify_method).alias("cosine"),
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


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    n_probes: int = 2,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    method: str = "expr",
    verify_method: str = "pandas",
) -> DataFrame:
    """IVF (inverted-file) approximate cosine top-k — the
    partition-pruned scale path beside ``lsh_cosine_topk``.

    Build: every corpus vector is assigned to its nearest centroid — the
    inverted index, paid once and reusable across query batches. Query:
    each query picks its ``n_probes`` nearest centroids and searches ONLY
    those inverted lists; the probe join broadcasts the (small) query
    side, so the corpus is never re-shuffled at query time and the
    scanned volume is ~``n_probes/K`` of the corpus. Deterministic:
    assignment ties break toward the smaller centroid id. Emitted cosines
    are exact — IVF, like the LSH variant, affects recall only;
    ``n_probes == n_centroids`` degenerates to the exact ``cosine_topk``
    result.

    Two assignment strategies (pytest-pinned to agree):

    - ``method="expr"`` — pure Catalyst: broadcast-crossjoin the K
      centroids, reduce with one map-side-combined ``max_by``. Fully
      DuckDB-oracle-able (with ``hash_fn="sha256"``), but materializes
      N × K join rows — right for small K.
    - ``method="pandas"`` — Arrow-vectorized: one numpy/BLAS matmul per
      batch against the broadcast normalized centroid matrix (collected
      once — K × dim doubles, bounded). No crossjoin, no aggregation:
      the index build is a pure map, which is the shape that survives
      K = tens of thousands of centroids at 10^9 vectors.
    """
    n_probes = max(1, min(n_probes, n_centroids))
    cents_df, index = ivf_index(
        corpus, n_centroids, id_col, vec_col, seed, hash_fn, method
    )
    return ivf_search(
        cents_df, index, queries, k, id_col, vec_col, n_probes, method,
        verify_method,
    )


def embedding_cosine_pairs_exact(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "pandas",
) -> DataFrame:
    """Exact embedding near-dup join: every (id_a < id_b) pair with
    cosine ≥ threshold. O(N²) self-join — the verification baseline; use
    ``embedding_dedup_pairs`` at scale."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            _cosine_col(F.col("_va"), F.col("_vb"), method).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def recommend_n_planes(n_rows: int, target_bucket_size: int = 1024) -> int:
    """Hyperplane count that keeps expected LSH bucket size near
    ``target_bucket_size``: n_planes = ceil(log2(N / target)).

    With H planes there are 2^H buckets; under a roughly uniform signature
    distribution the self-join volume is Σ b_i² ≈ N²/2^H, so holding
    N/2^H ≈ target bounds per-bucket pair work at ~N·target regardless of
    corpus size — the sizing rule that keeps ``embedding_dedup_pairs``
    linear-ish at 10^9 vectors (each added plane halves join volume and
    costs one more sign-bit recall haircut; see the recall math in
    ``embedding_dedup_pairs``). Clamped to [1, 30].
    """
    import math

    if n_rows <= 0:
        return 1
    return max(
        1,
        min(30, math.ceil(math.log2(max(2.0, n_rows / max(1, target_bucket_size))))),
    )


def embedding_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 4,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    method: str = "pandas",
    expected_rows: int | None = None,
    pair_budget: float = 1e12,
) -> DataFrame:
    """Embedding-cosine near-dup join, LSH-bucketed: candidates share a
    hyperplane sign-bit bucket, then the exact cosine verifies ≥ threshold.

    The dedup sibling of MinHash-LSH (pipeline/dedup.py minhash_lsh_pairs):
    same candidate-then-verify shape, same determinism guarantee (emitted
    pairs are truly ≥ threshold; LSH only affects recall). With B = 2^H
    buckets the self-join volume is Σ b_i² instead of N² — the only shape
    that survives a 10^9-vector corpus. For near-dup thresholds (cosine
    ≥ 0.9) the angle between pair members is ≤ 26°, so a random hyperplane
    separates them with probability ≤ 26/180 per plane — recall stays high
    exactly where dedup operates. ``hash_fn="sha256"`` makes the buckets
    DuckDB-reproducible for the driver oracle.

    Sizing: the candidate join volume is ~N²/2^n_planes, so ``n_planes``
    must GROW with the corpus — size it with ``recommend_n_planes(N)``
    (n_planes = ceil(log2(N/target_bucket_size))). Pass ``expected_rows``
    (a known/estimated corpus size — no job is run) and the function warns
    when the estimated volume exceeds ``pair_budget``, naming the
    recommended plane count; the default 4 planes is a small-corpus/test
    setting, silently quadratic-ish at web scale without this check.
    """
    if expected_rows is not None:
        est_pairs = (expected_rows**2) / float(2**n_planes)
        if est_pairs > pair_budget:
            import logging

            logging.getLogger(__name__).warning(
                "embedding_dedup_pairs: n_planes=%d gives ~%.2g candidate "
                "pairs for %d rows (budget %.2g); use n_planes>=%d "
                "(recommend_n_planes)",
                n_planes,
                est_pairs,
                expected_rows,
                pair_budget,
                recommend_n_planes(expected_rows),
            )
    sig = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        _signature(vec_col, dim, n_planes, seed, hash_fn).alias("_sig"),
    )
    a = sig.alias("a")
    b = sig.alias("b")
    cands = a.join(
        b,
        (F.col("a._sig") == F.col("b._sig")) & (F.col("a._id") < F.col("b._id")),
    ).select(
        F.col("a._id").alias("id_a"),
        F.col("b._id").alias("id_b"),
        _cosine_col(F.col("a._v"), F.col("b._v"), method).alias("cosine"),
    )
    return cands.filter(F.col("cosine") >= threshold)
