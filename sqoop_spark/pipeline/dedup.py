"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (Sqoop moves rows; it never dedups content) —
these are the operations a 100 TB corpus ingest needs on top of the CDC
core, built Spark-first:

- ``exact_dedup`` — hash-groupBy on sha256(text): one shuffle, map-side
  partial aggregation, no UDFs.
- ``jaccard_pairs`` — exact n-gram Jaccard via an inverted shingle index:
  explode → self-join on shingle → count intersections → |A∪B| from
  per-doc shingle counts. No O(N²) cross join: only pairs sharing ≥1
  shingle are materialized, and a document-frequency cap drops
  stopword-like shingles whose postings would otherwise create a
  quadratic pair blowup (one shingle in 10^6 docs → 10^12 join rows).
- ``minhash_signatures`` / ``minhash_lsh_pairs`` — MinHash entirely
  JVM-side: permutation k's hash is ``xxhash64(shingle, k)`` (or a
  portable sha256-derived hash — see ``hash_fn``), the signature is P
  ``min`` aggregates in ONE groupBy; LSH bands hash signature slices and
  a band-bucket self-join yields candidates. The exact-Jaccard verify
  step runs ONLY over the candidate documents (shingle postings
  semi-joined down to candidate ids first) — never the full corpus,
  which is the whole point of LSH at scale.
- ``simhash`` — 64-bit SimHash from per-token bit votes, also pure
  DataFrame ops (explode → conditional sums → bit reassembly).

``hash_fn``: "xxhash64" (default — fastest, JVM-intrinsic) or "sha256"
(portable: the first 15 hex chars of sha256 as a base-16 integer, a 60-bit
hash that DuckDB/any ANSI engine computes identically — used by the
driver-contract oracles so MinHash/SimHash results are independently
checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from sqoop_spark.errors import EngineError


def _shingles(df: DataFrame, text_col: str, k: int) -> DataFrame:
    """Word k-shingles per row: split on single spaces (the corpus'
    tokenization), slide a k-window, keep distinct shingles per doc."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " ")
    )
    return df.withColumn("_shingle", F.explode(F.array_distinct(sh)))


def _hash64(col, salt: int, hash_fn: str):
    """Seeded 64-bit-ish hash of a string column.

    "xxhash64": Spark's JVM intrinsic (fast path). "sha256": first 15 hex
    chars of sha256("<salt>|" + value) as a base-16 integer — 60 bits,
    reproducible in DuckDB as ('0x' || substr(sha256(...), 1, 15))::BIGINT,
    which is what gives the MinHash/SimHash driver queries a real oracle.
    """
    if hash_fn == "xxhash64":
        return F.xxhash64(col, F.lit(salt))
    if hash_fn == "sha256":
        return F.conv(
            F.substring(F.sha2(F.concat(F.lit(f"{salt}|"), col), 256), 1, 15), 16, 10
        ).cast("long")
    raise EngineError(f"unknown hash_fn {hash_fn!r}; use 'xxhash64' or 'sha256'")


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate collapse: keep the lowest id per sha256(text).

    Returns (content_sha, keep_id, n_dups). One hash-partitioned groupBy —
    at 100 TB the shuffle key is the 64-hex digest, uniformly distributed
    by construction, so no skew handling is needed.
    """
    return (
        df.select(F.sha2(F.col(text_col), 256).alias("content_sha"), F.col(id_col))
        .groupBy("content_sha")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def _capped_shingles(sh: DataFrame, max_doc_freq: int | None) -> DataFrame:
    """Drop postings of shingles present in more than ``max_doc_freq`` docs.

    A stopword-like shingle with 10^6 postings creates ~10^12 join rows in
    the inverted-index self-join — the classic web-scale blowup. The hot
    list is tiny by construction (few shingles exceed the cap), so the
    anti-join broadcasts. Jaccard stays exact over the FILTERED shingle
    universe (sizes and intersections both computed post-cap); ubiquitous
    shingles carry no similarity signal, which is why every production
    near-dup pipeline drops them.
    """
    if max_doc_freq is None:
        return sh
    hot = (
        sh.groupBy("_shingle")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > max_doc_freq)
        .select("_shingle")
    )
    return sh.join(F.broadcast(hot), "_shingle", "left_anti")


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.5,
    max_doc_freq: int | None = 10_000,
) -> DataFrame:
    """Exact word-k-gram Jaccard similarity join: pairs with J ≥ threshold.

    Inverted-index formulation: |A∩B| from a shingle self-join, |A∪B| =
    |A| + |B| − |A∩B|. Only co-shingled pairs shuffle; ``max_doc_freq``
    (default 10 000) bounds the worst case — see ``_capped_shingles``.
    Pass ``max_doc_freq=None`` for the exact-over-all-shingles variant.
    """
    sh = _capped_shingles(
        _shingles(df, text_col, k).select(F.col(id_col).alias("_id"), "_shingle"),
        max_doc_freq,
    )
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a._shingle") == F.col("b._shingle")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("n_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("n_b"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "n_common", "jaccard")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_perm: int = 16,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MinHash signature per doc: sig[p] = min over shingles of
    hash(shingle, p). One explode + one groupBy with P min-aggregates —
    all JVM-side, no Python in the loop."""
    sh = _shingles(df, text_col, k)
    aggs = [
        F.min(_hash64(F.col("_shingle"), p, hash_fn)).alias(f"h{p}")
        for p in range(num_perm)
    ]
    sig = sh.groupBy(F.col(id_col)).agg(*aggs)
    return sig.select(
        F.col(id_col),
        F.array(*[F.col(f"h{p}") for p in range(num_perm)]).alias("signature"),
    )


def _band_hash(cols: list, hash_fn: str):
    """Hash one band's signature slice to a bucket key."""
    if hash_fn == "xxhash64":
        return F.xxhash64(*cols)
    # portable: sha256 of the '|'-joined decimal strings (DuckDB twin:
    # sha256(concat_ws('|', h_i, ...)))
    return F.conv(
        F.substring(
            F.sha2(F.concat_ws("|", *[c.cast("string") for c in cols]), 256), 1, 15
        ),
        16,
        10,
    ).cast("long")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_perm: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MinHash + LSH banding near-dup join, exact-Jaccard verified.

    Pipeline: signatures → per-band hash → self-join on (band, band_hash)
    → distinct candidate pairs → verify with exact Jaccard ≥ threshold,
    computed ONLY over the candidate documents: the shingle postings are
    first semi-joined down to ids appearing in some candidate pair, so the
    verify cost is O(candidate docs' shingles), not O(corpus) — running
    the full-corpus exact join here would make LSH pointless at scale.
    The verify step makes results deterministic (LSH only affects recall;
    every emitted pair is truly ≥ threshold).
    """
    rows_per_band = num_perm // bands
    sig = minhash_signatures(df, text_col, id_col, k, num_perm, hash_fn)
    banded = sig.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _band_hash(
                            [
                                F.element_at("signature", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ],
                            hash_fn,
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bhash")
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )

    # Exact-Jaccard verify restricted to candidate docs: postings of
    # non-candidate documents never enter the self-join. The candidate id
    # set is small relative to the corpus (that's what banding is for), so
    # the semi-join broadcasts (AQE converts at runtime from actual size).
    cand_ids = (
        cands.select(F.col("id_a").alias("_id"))
        .unionByName(cands.select(F.col("id_b").alias("_id")))
        .distinct()
    )
    sh = _shingles(df, text_col, k).select(F.col(id_col).alias("_id"), "_shingle")
    sh_c = sh.join(cand_ids, "_id", "left_semi")
    sizes = sh_c.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    sa = sh_c.alias("a")
    sb = sh_c.alias("b")
    inter = (
        sa.join(
            sb,
            (F.col("a._shingle") == F.col("b._shingle"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
        # only LSH candidate pairs proceed to the union-size join
        .join(cands, ["id_a", "id_b"], "left_semi")
    )
    verified = (
        inter.join(sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("n_a")), "id_a")
        .join(sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("n_b")), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "n_common", "jaccard")


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash fingerprints: per-token hash bit votes, sign-aggregated.

    explode(tokens) → for each bit i a conditional ±1 sum → reassemble the
    fingerprint. Pure DataFrame ops; the ``bits`` aggregates run in one
    map-side-combined groupBy. With ``hash_fn="sha256"`` the token hash is
    60-bit (so bits ≤ 60) but DuckDB-reproducible.
    """
    if hash_fn == "sha256" and bits > 60:
        raise EngineError("hash_fn='sha256' provides 60 hash bits; bits must be <= 60")
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("_tok")
    ).withColumn("_h", _hash64(F.col("_tok"), 0, hash_fn))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    votes = tok.groupBy(id_col).agg(*aggs)
    fp = F.lit(0).cast("long")
    for i in range(bits):
        fp = fp.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return votes.select(F.col(id_col), fp.alias("simhash"))


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Near-dup pairs → clusters: connected components as (id, cluster_id),
    where ``cluster_id`` is the minimum member id of the component. The
    canonical last step of every dedup family here (Jaccard / MinHash-LSH /
    SimHash / embedding-cosine all emit pair sets): keep ``id ==
    cluster_id``, drop the rest, and transitive duplicates (A~B, B~C, A!~C)
    collapse to ONE survivor instead of the pair-wise two.

    Distributed min-label propagation with pointer jumping: every node
    starts labelled with its own id; each round joins labels across the
    symmetrized edge set PLUS the current (label ↔ id) links and keeps the
    per-node minimum. A node's label is always an id inside its own
    component, so the label links are intra-component edges — adding them
    never merges components, but it lets a chain's minimum travel 2^round
    hops instead of 1 (the hash-to-min idea of Rastogi et al., "Finding
    Connected Components in MapReduce"; large-star/small-star is the same
    O(log N)-round family). Each round is one shuffle join (edges ×
    labels, both hash-partitioned on the join key) plus one
    map-side-combined min groupBy over N label rows — label frames are
    (id, long) pairs, never the corpus. The pair plan is materialized ONCE
    (``localCheckpoint``) before the loop — LSH/verify work is never
    re-executed per round — and each round checkpoints the (old, new)
    label join, so convergence is read off the materialized frame without
    a second job and lineage stays O(1) deep.

    Only ids appearing in ≥1 pair are returned — singleton documents are
    their own cluster by definition and never shuffle.
    """
    edges = (
        pairs.select(F.col(id_a).alias("_src"), F.col(id_b).alias("_dst"))
        .union(pairs.select(F.col(id_b).alias("_src"), F.col(id_a).alias("_dst")))
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("_src").alias("_id"))
        .distinct()
        .select("_id", F.col("_id").alias("_label"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        label_edges = labels.select(
            F.col("_label").alias("_src"), F.col("_id").alias("_dst")
        ).union(
            labels.select(F.col("_id").alias("_src"), F.col("_label").alias("_dst"))
        )
        propagated = (
            edges.union(label_edges)
            .join(labels.withColumnRenamed("_id", "_src"), "_src")
            .select(F.col("_dst").alias("_id"), F.col("_label"))
        )
        cmp = (
            labels.union(propagated)
            .groupBy("_id")
            .agg(F.min("_label").alias("_label"))
            .join(labels.withColumnRenamed("_label", "_old"), "_id")
            .localCheckpoint()
        )
        changed = cmp.filter(F.col("_label") < F.col("_old")).limit(1).count()
        labels = cmp.select("_id", "_label")
        if changed == 0:
            break
    return labels.select(F.col("_id").alias("id"), F.col("_label").alias("cluster_id"))


def dedup_resolve(
    docs: DataFrame,
    clusters: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep-policy resolution: the end of the dedup pipeline — given the
    cluster labels from :func:`connected_components`, decide per document
    whether it survives. One survivor per cluster: the highest
    ``score_col`` wins (quality-first keep policy — longest text, best
    quality score, freshest crawl), ties break to the smallest id so the
    decision is deterministic. Documents absent from ``clusters`` are
    singletons and always survive.

    Shape at scale: ``clusters`` holds only clustered ids (a small
    fraction of the corpus), so the join broadcasts or AQE-sizes itself;
    the survivor choice is one window keyed on ``cluster_id`` whose
    ascending/descending row_number gets the same map-side
    ``WindowGroupLimit`` partial pre-reduce as the newest-wins merge —
    a pathological million-member cluster forwards ≤ 1 row per map task.
    Returns ``(id_col, cluster_id, score_col, keep)`` for every input doc.
    """
    labeled = docs.select(F.col(id_col), F.col(score_col)).join(
        clusters.select(F.col("id").alias(id_col), "cluster_id"),
        id_col,
        "left",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    clustered = (
        labeled.filter(F.col("cluster_id").isNotNull())
        .withColumn("keep", F.row_number().over(w) == 1)
    )
    singletons = labeled.filter(F.col("cluster_id").isNull()).select(
        F.col(id_col),
        F.col(score_col),
        F.col(id_col).alias("cluster_id"),
        F.lit(True).alias("keep"),
    )
    return clustered.select(id_col, score_col, "cluster_id", "keep").unionByName(
        singletons
    )
