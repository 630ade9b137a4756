"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (Sqoop moves rows; it never dedups content) —
these are the operations a 100 TB corpus ingest needs on top of the CDC
core, built Spark-first:

- ``exact_dedup`` — hash-groupBy on sha256(text): one shuffle, map-side
  partial aggregation, no UDFs.
- ``jaccard_pairs`` — exact n-gram Jaccard via an inverted shingle index:
  explode → self-join on shingle → count intersections → |A∪B| from
  per-doc shingle counts. No O(N²) cross join: only pairs sharing ≥1
  shingle are materialized, which is the classic scalable formulation.
- ``minhash_signatures`` / ``minhash_lsh_pairs`` — MinHash entirely
  JVM-side: permutation k's hash is ``xxhash64(shingle, k)``, the signature
  is P ``min`` aggregates in ONE groupBy; LSH bands hash signature slices
  and a band-bucket self-join yields candidates, verified with exact
  Jaccard. Shuffle count stays constant in corpus size; band join keys are
  (band_idx, band_hash) so hot buckets spread across partitions.
- ``simhash`` — 64-bit SimHash from per-token bit votes, also pure
  DataFrame ops (explode → 64 conditional sums → bit reassembly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


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


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-k-gram Jaccard similarity join: pairs with J ≥ threshold.

    Inverted-index formulation: |A∩B| from a shingle self-join, |A∪B| =
    |A| + |B| − |A∩B|. Only co-shingled pairs shuffle; a frequency cap on
    pathological shingles would bound the worst case at web scale (not
    needed for this corpus' uniform vocabulary).
    """
    sh = _shingles(df, text_col, k).select(
        F.col(id_col).alias("_id"), "_shingle"
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
) -> DataFrame:
    """MinHash signature per doc: sig[p] = min over shingles of
    xxhash64(shingle, p). One explode + one groupBy with P min-aggregates —
    all JVM-side, no Python in the loop."""
    sh = _shingles(df, text_col, k)
    aggs = [
        F.min(F.xxhash64(F.col("_shingle"), F.lit(p))).alias(f"h{p}")
        for p in range(num_perm)
    ]
    sig = sh.groupBy(F.col(id_col)).agg(*aggs)
    return sig.select(
        F.col(id_col),
        F.array(*[F.col(f"h{p}") for p in range(num_perm)]).alias("signature"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_perm: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH banding near-dup join, exact-Jaccard verified.

    Pipeline: signatures → per-band hash → self-join on (band, band_hash)
    → distinct candidate pairs → verify with exact Jaccard ≥ threshold.
    The verify step makes results deterministic (LSH only affects recall;
    every emitted pair is truly ≥ threshold).
    """
    rows_per_band = num_perm // bands
    sig = minhash_signatures(df, text_col, id_col, k, num_perm)
    banded = sig.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("signature", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
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
    exact = jaccard_pairs(df, text_col, id_col, k, threshold)
    return cands.join(exact, ["id_a", "id_b"]).select(
        "id_a", "id_b", "n_common", "jaccard"
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash: per-token xxhash64 bit votes, sign-aggregated.

    explode(tokens) → for each bit i a conditional ±1 sum → reassemble the
    fingerprint. Pure DataFrame ops; the 64 aggregates run in one
    map-side-combined groupBy.
    """
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("_tok")
    ).withColumn("_h", F.xxhash64("_tok"))
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
