"""Training-data pipeline operators: dedup, text analysis, similarity,
multimodal plumbing — verified against independent pandas/numpy oracles
(mirroring the reference's read-back-and-compare-sets test style,
TestIncrementalImport.assertDirOfNumbers at :316-361)."""

import hashlib
import itertools

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from sqoop_spark.pipeline import (
    cosine_topk,
    exact_dedup,
    jaccard_pairs,
    lang_id,
    lsh_cosine_topk,
    minhash_lsh_pairs,
    minhash_signatures,
    quality_score,
    simhash,
    token_count,
)
from sqoop_spark.pipeline.multimodal import extract_features, synthesize_media
from sqoop_spark.pipeline.text import LANG_PROFILES, STOPWORDS, doc_fingerprint


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").cache()


@pytest.fixture(scope="module")
def docs_pdf(docs):
    return docs.toPandas()


def _shingle_set(text: str, k: int = 5) -> set:
    toks = text.split(" ")
    if len(toks) <= k:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_exact_dedup(spark, docs, docs_pdf):
    out = exact_dedup(docs).toPandas()
    expected = (
        docs_pdf.assign(sha=docs_pdf.text.map(lambda t: hashlib.sha256(t.encode()).hexdigest()))
        .groupby("sha")
        .agg(keep_id=("doc_id", "min"), n_dups=("doc_id", "count"))
        .reset_index()
    )
    got = out.sort_values("content_sha").reset_index(drop=True)
    exp = expected.sort_values("sha").reset_index(drop=True)
    assert got["keep_id"].tolist() == exp["keep_id"].tolist()
    assert got["n_dups"].tolist() == exp["n_dups"].tolist()
    # with a synthetic dup injected, the group collapses
    dup = docs.limit(1).withColumn("doc_id", F.col("doc_id") + 100000)
    out2 = exact_dedup(docs.unionByName(dup)).toPandas()
    assert (out2["n_dups"] == 2).sum() == 1


def test_jaccard_pairs_matches_bruteforce(spark, docs, docs_pdf):
    sample = docs.filter(F.col("doc_id") < 60)
    got = jaccard_pairs(sample, k=3, threshold=0.05).toPandas()
    sets = {
        r.doc_id: _shingle_set(r.text, 3)
        for r in docs_pdf[docs_pdf.doc_id < 60].itertuples()
    }
    exp = []
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter == 0:
            continue
        j = inter / len(sets[a] | sets[b])
        if j >= 0.05:
            exp.append((a, b, inter, j))
    got_pairs = {(r.id_a, r.id_b): (r.n_common, round(r.jaccard, 9)) for r in got.itertuples()}
    exp_pairs = {(a, b): (i, round(j, 9)) for a, b, i, j in exp}
    assert got_pairs == exp_pairs


def test_minhash_lsh_subset_of_exact_and_high_recall(spark, docs):
    # inject near-dup docs so LSH has something to find: copy docs with the
    # last token changed
    base = docs.filter(F.col("doc_id") < 50)
    near = base.withColumn("doc_id", F.col("doc_id") + 1000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zz"))
    )
    corpus = base.unionByName(near)
    exact = jaccard_pairs(corpus, k=5, threshold=0.7).toPandas()
    approx = minhash_lsh_pairs(corpus, k=5, num_perm=16, bands=8, threshold=0.7).toPandas()
    exact_pairs = set(zip(exact.id_a, exact.id_b))
    approx_pairs = set(zip(approx.id_a, approx.id_b))
    assert approx_pairs <= exact_pairs  # every emitted pair is verified
    assert len(exact_pairs) >= 50  # the injected near-dups are in range
    recall = len(approx_pairs) / len(exact_pairs)
    assert recall >= 0.9, f"LSH recall too low: {recall}"


def test_minhash_signatures_deterministic(spark, docs):
    s1 = minhash_signatures(docs.limit(20)).toPandas().sort_values("doc_id")
    s2 = minhash_signatures(docs.limit(20)).toPandas().sort_values("doc_id")
    assert s1.signature.map(tuple).tolist() == s2.signature.map(tuple).tolist()


def test_simhash_similar_docs_close(spark, docs):
    base = docs.filter(F.col("doc_id") < 30)
    tweaked = base.withColumn("doc_id", F.col("doc_id") + 1000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zz"))
    )
    fp = simhash(base.unionByName(tweaked)).toPandas().set_index("doc_id").simhash
    dists = []
    for i in range(30):
        x = int(fp[i]) ^ int(fp[i + 1000])
        dists.append(bin(x & 0xFFFFFFFFFFFFFFFF).count("1"))
    assert max(dists) <= 8, f"near-identical docs too far: {dists}"


def test_text_metrics_vs_pandas(spark, docs, docs_pdf):
    tc = token_count(docs).toPandas().set_index("doc_id").n_tokens
    qs = quality_score(docs).toPandas().set_index("doc_id")
    li = lang_id(docs).toPandas().set_index("doc_id")
    for r in docs_pdf.itertuples():
        toks = r.text.split(" ")
        assert tc[r.doc_id] == len(toks)
        assert qs.loc[r.doc_id, "n_chars"] == len(r.text)
        stop = sum(1 for t in toks if t in STOPWORDS)
        assert qs.loc[r.doc_id, "stopword_ratio"] == pytest.approx(stop / len(toks))
        scores = {
            lang: sum(sum(1 for t in toks if t == m) for m in markers)
            for lang, markers in LANG_PROFILES.items()
        }
        best = max(scores, key=lambda kk: (scores[kk], -list(LANG_PROFILES).index(kk)))
        assert li.loc[r.doc_id, "lang_pred"] == best


def test_doc_fingerprint(spark, docs, docs_pdf):
    fp = doc_fingerprint(docs, k=5).toPandas().set_index("doc_id").fingerprint
    r = docs_pdf.iloc[0]
    expected = min(
        hashlib.sha256(s.encode()).hexdigest() for s in _shingle_set(r.text, 5)
    )
    assert fp[r.doc_id] == expected


def test_cosine_topk_vs_numpy(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    got = cosine_topk(emb, queries, k=5).toPandas()
    pdf = emb.toPandas()
    mat = np.stack(pdf.embedding.map(lambda v: np.asarray(v, dtype="float64")))
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = pdf.vec_id.to_numpy()
    for q in range(3):
        qi = np.where(ids == q)[0][0]
        sims = mat @ mat[qi]
        order = [
            int(ids[i])
            for i in np.argsort(-sims, kind="stable")
            if ids[i] != q
        ][:5]
        mine = got[got.query_id == q].sort_values("rank").neighbor_id.tolist()
        assert mine == order, f"query {q}: {mine} vs {order}"


def test_lsh_cosine_scores_exact_within_bucket(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    approx = lsh_cosine_topk(emb, queries, k=3).toPandas()
    exact = cosine_topk(emb, queries, k=200).toPandas()
    exact_scores = {
        (r.query_id, r.neighbor_id): r.cosine for r in exact.itertuples()
    }
    assert len(approx) > 0
    for r in approx.itertuples():
        assert exact_scores[(r.query_id, r.neighbor_id)] == pytest.approx(r.cosine)


def test_multimodal_real_codec_features(spark):
    """decode='numpy' parses the real containers (PPM/WAV/VID0) and the
    features match an independent pure-Python recomputation from the
    closed-form byte generators."""
    media = synthesize_media(spark, 100)
    feats = extract_features(media).toPandas().set_index("media_id")
    assert len(feats) == 100
    assert set(feats.modality) == {"image", "audio", "video"}
    for mid in range(100):
        mod = ("image", "audio", "video")[mid % 3]
        row = feats.loc[mid]
        assert row.modality == mod
        if mod == "image":
            w, h = 4 + mid % 13, 3 + mid % 7
            vals = [(mid * 31 + i * 7) % 256 for i in range(w * h * 3)]
            hdr = len(f"P6\n{w} {h}\n255\n")
            assert row.n_bytes == hdr + w * h * 3
            exp = [w, h, w * h * 3, sum(vals) / (w * h * 3)]
            for c in range(3):
                exp.append(sum(vals[c::3]) / (w * h))
            exp.append(0.0)
        elif mod == "audio":
            n = 64 + mid % 129
            s = [((mid * 13 + i * 5) % 65536) - 32768 for i in range(n)]
            assert row.n_bytes == 44 + 2 * n
            exp = [
                n, 16000, sum(s) / n, sum(abs(x) for x in s) / n,
                min(s), max(s), (sum(x * x for x in s) / n) ** 0.5, 0.0,
            ]
        else:
            nf, w, h = 1 + mid % 5, 4 + mid % 5, 3 + mid % 3
            vals = [
                (mid * 31 + f * 131 + i * 7) % 256
                for f in range(nf)
                for i in range(w * h * 3)
            ]
            hdr = len(f"P6\n{w} {h}\n255\n")
            assert row.n_bytes == 8 + nf * (4 + hdr + w * h * 3)
            f0 = vals[: w * h * 3]
            exp = [nf, w, h, sum(vals) / len(vals), sum(f0) / len(f0), 0, 0, 0]
        got = list(row.features)
        assert got == pytest.approx(exp, abs=0, rel=0), (mid, mod)


def test_multimodal_codec_roundtrip():
    """Pure-numpy codecs round-trip bit-exactly (no Spark needed)."""
    from sqoop_spark.pipeline.multimodal import (
        decode_ppm, decode_vid0, decode_wav, encode_ppm, encode_vid0, encode_wav,
    )

    px = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    assert (decode_ppm(encode_ppm(px)) == px).all()
    s = (np.arange(100) * 371 % 65536 - 32768).astype(np.int16)
    s2, sr = decode_wav(encode_wav(s, 22050))
    assert sr == 22050 and (s2 == s).all()
    frames = [px, px[::-1].copy()]
    back = decode_vid0(encode_vid0(frames))
    assert len(back) == 2 and all((a == b).all() for a, b in zip(back, frames))
    with pytest.raises(ValueError, match="not a P6 PPM"):
        decode_ppm(b"JUNK")
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"JUNK" * 4)


def test_multimodal_fake_and_raise_paths(spark):
    media = synthesize_media(spark, 10)
    with pytest.raises(Exception, match="requires"):
        extract_features(media, decode="raise").collect()
    with pytest.raises(ValueError, match="unknown decode"):
        extract_features(media, decode="bogus")
    feats = extract_features(media, decode="fake").toPandas()
    f0 = feats.sort_values("media_id").features.iloc[0]
    assert len(f0) == 8 and all(0 <= x <= 1 for x in f0)
    again = extract_features(media, decode="fake").toPandas().sort_values("media_id")
    assert again.features.map(tuple).tolist() == feats.sort_values(
        "media_id"
    ).features.map(tuple).tolist()


def test_jaccard_doc_freq_cap_bounds_blowup(spark, docs):
    """A pathological hot shingle shared by every doc must not produce
    quadratic candidate pairs once max_doc_freq engages."""
    base = docs.limit(40).select(
        "doc_id", F.concat(F.lit("common token run glue pad "), F.col("text")).alias("text")
    )
    # uncapped: the injected 5-gram co-shingles ALL 40 docs → 780 pairs enter
    # the intersection join; capped: only genuinely similar pairs survive
    uncapped = jaccard_pairs(base, k=5, threshold=0.0, max_doc_freq=None).toPandas()
    assert len(uncapped) == 40 * 39 // 2  # every pair co-shingled via the hot run
    capped = jaccard_pairs(base, k=5, threshold=0.0, max_doc_freq=10).toPandas()
    assert len(capped) < len(uncapped) / 4
    # and the capped jaccard is exact over the filtered shingle universe:
    # re-derive expected pairs in pandas with the same cap
    pdf = base.toPandas()
    shingles = {r.doc_id: _shingle_set(r.text, 5) for r in pdf.itertuples()}
    from collections import Counter

    df_counts = Counter(s for ss in shingles.values() for s in ss)
    keep = {s for s, c in df_counts.items() if c <= 10}
    filtered = {d: ss & keep for d, ss in shingles.items()}
    exp = set()
    for a, b in itertools.combinations(sorted(filtered), 2):
        inter = len(filtered[a] & filtered[b])
        if inter > 0:
            exp.add((a, b))
    assert {(r.id_a, r.id_b) for r in capped.itertuples()} == exp


def test_minhash_lsh_verify_restricted_to_candidates(spark, docs):
    """The exact-Jaccard verify step must read shingles only for candidate
    docs: the physical plan shows the posting scan behind a left-semi join
    against the candidate id set (never a full-corpus pair join)."""
    corpus = docs.limit(120)
    out = minhash_lsh_pairs(corpus, k=5, num_perm=16, bands=8, threshold=0.7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, "verify step not candidate-restricted"
    # emitted pairs are still exactly (candidates ∩ exact-threshold pairs)
    exact = jaccard_pairs(corpus, k=5, threshold=0.7, max_doc_freq=None).toPandas()
    approx = out.toPandas()
    exact_pairs = {(r.id_a, r.id_b) for r in exact.itertuples()}
    assert {(r.id_a, r.id_b) for r in approx.itertuples()} <= exact_pairs


def test_minhash_lsh_sha256_portable_hash(spark, docs):
    """hash_fn='sha256' (the DuckDB-reproducible 60-bit hash) keeps all
    LSH properties: deterministic, subset-of-exact, high recall at the
    MinHash operating point."""
    corpus = docs.limit(120)
    exact = jaccard_pairs(corpus, k=5, threshold=0.7, max_doc_freq=None).toPandas()
    a1 = minhash_lsh_pairs(
        corpus, k=5, num_perm=16, bands=8, threshold=0.7, hash_fn="sha256"
    ).toPandas()
    a2 = minhash_lsh_pairs(
        corpus, k=5, num_perm=16, bands=8, threshold=0.7, hash_fn="sha256"
    ).toPandas()
    key = lambda df: sorted((r.id_a, r.id_b) for r in df.itertuples())  # noqa: E731
    assert key(a1) == key(a2)  # deterministic
    exact_pairs = {(r.id_a, r.id_b) for r in exact.itertuples()}
    got = set(key(a1))
    assert got <= exact_pairs
    if exact_pairs:
        assert len(got) / len(exact_pairs) >= 0.8  # recall at 16/8 banding


def test_simhash_sha256_mode(spark, docs):
    """Portable-hash SimHash: deterministic, and bits > 60 rejected."""
    from sqoop_spark.errors import EngineError

    base = docs.limit(20)
    f1 = simhash(base, bits=32, hash_fn="sha256").toPandas().sort_values("doc_id")
    f2 = simhash(base, bits=32, hash_fn="sha256").toPandas().sort_values("doc_id")
    assert f1.simhash.tolist() == f2.simhash.tolist()
    with pytest.raises(EngineError, match="60"):
        simhash(base, bits=64, hash_fn="sha256")


def test_lsh_multiprobe_improves_recall(spark):
    """Hamming-1 multi-probe recovers neighbors a single-bucket probe
    misses, at fixed n_planes — recall must be monotonically ≥ and
    strictly better somewhere on this corpus."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=3).toPandas()
    truth = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}

    def recall(n_probes):
        got = lsh_cosine_topk(
            emb, queries, k=3, n_planes=6, n_probes=n_probes
        ).toPandas()
        hits = {(r.query_id, r.neighbor_id) for r in got.itertuples()} & truth
        return len(hits) / len(truth)

    r1, r_all = recall(1), recall(7)  # 7 = home + all 6 Hamming-1 buckets
    assert r_all >= r1
    assert r_all > r1, f"multi-probe did not improve recall ({r1} -> {r_all})"
    # scores remain exact cosines (verified within-bucket elsewhere); and
    # multi-probe returns at most k rows per query
    got = lsh_cosine_topk(emb, queries, k=3, n_planes=6, n_probes=7).toPandas()
    assert got.groupby("query_id").size().max() <= 3


def test_embedding_dedup_pairs(spark):
    """Embedding-cosine near-dup join: emitted pairs are a subset of the
    exact pair join (verify step guarantees it), exact duplicates are
    always found (identical vectors share every sign bit), deterministic."""
    from sqoop_spark.pipeline import embedding_cosine_pairs_exact, embedding_dedup_pairs

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    # inject an exact duplicate of vec 0 with a fresh id
    dup = emb.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(dup)
    got = embedding_dedup_pairs(corpus, threshold=0.95).toPandas()
    assert (0, 100000) in {(r.id_a, r.id_b) for r in got.itertuples()}
    # subset of exact at the same threshold
    exact = embedding_cosine_pairs_exact(corpus, threshold=0.95).toPandas()
    got_pairs = {(r.id_a, r.id_b) for r in got.itertuples()}
    exact_pairs = {(r.id_a, r.id_b) for r in exact.itertuples()}
    assert got_pairs <= exact_pairs
    # every emitted cosine is truly >= threshold (verify semantics)
    assert (got.cosine >= 0.95).all()
    # deterministic + portable hash variant agrees on the dup pair
    again = embedding_dedup_pairs(corpus, threshold=0.95, hash_fn="sha256").toPandas()
    assert (0, 100000) in {(r.id_a, r.id_b) for r in again.itertuples()}


def test_multimodal_frame_sample(spark):
    """1:N frame fan-out with the real VID0 codec: only video rows cross
    into Python, the emitted frames ARE the container's PPM frames (capped
    at max_frames), with real dimensions and f/fps timestamps."""
    from sqoop_spark.pipeline.multimodal import (
        decode_ppm, decode_vid0, frame_sample, synthesize_media,
    )

    media = synthesize_media(spark, 60)
    frames = frame_sample(media, fps=2.0, max_frames=3).toPandas()
    vid_rows = media.filter(F.col("modality") == "video").collect()
    assert set(frames.media_id.unique()) == {r.media_id for r in vid_rows}
    by_mid = {r.media_id: bytes(r.payload) for r in vid_rows}
    for mid, grp in frames.groupby("media_id"):
        container = decode_vid0(by_mid[mid])
        assert len(grp) == min(3, len(container))
        for _, r in grp.iterrows():
            fr = decode_ppm(bytes(r.frame))
            assert (fr == container[r.frame_idx]).all()
            assert (r.height, r.width, 3) == fr.shape
            assert r.ts_sec == r.frame_idx / 2.0
    # deterministic
    again = frame_sample(media, fps=2.0, max_frames=3).toPandas()
    key = lambda df: sorted(zip(df.media_id, df.frame_idx, df.frame.map(bytes)))  # noqa: E731
    assert key(frames) == key(again)


def test_multimodal_resize(spark):
    """1:1 resize with the real codec: payload re-encoded as a PPM of the
    target size whose pixels are the nearest-neighbor sample of the
    original; meta stays consistent; other modalities untouched."""
    from sqoop_spark.pipeline.multimodal import (
        decode_ppm, resize_media, synthesize_media,
    )

    media = synthesize_media(spark, 30)
    out = resize_media(media, 10, 6)
    assert out.schema == media.schema
    pdf = out.toPandas().set_index("media_id")
    orig = media.toPandas().set_index("media_id")
    for mid in pdf.index:
        if pdf.loc[mid, "modality"] == "image":
            assert pdf.loc[mid, "meta"]["width"] == 10
            assert pdf.loc[mid, "meta"]["height"] == 6
            got = decode_ppm(bytes(pdf.loc[mid, "payload"]))
            src = decode_ppm(bytes(orig.loc[mid, "payload"]))
            assert got.shape == (6, 10, 3)
            h0, w0, _ = src.shape
            rows = (np.arange(6) * h0) // 6
            cols = (np.arange(10) * w0) // 10
            assert (got == src[rows][:, cols]).all()
        else:
            assert bytes(pdf.loc[mid, "payload"]) == bytes(orig.loc[mid, "payload"])
            assert pdf.loc[mid, "meta"] == orig.loc[mid, "meta"]


def test_token_count_bpe_regex(spark, docs):
    """BPE-ish regex tokenization: Spark (Java regex) and DuckDB (RE2)
    must agree token-for-token on the shared \\p-class pattern, including
    punctuation/contraction/unicode edge cases."""
    import duckdb

    from sqoop_spark.pipeline.text import BPE_REGEX

    extra = spark.createDataFrame(
        [
            (900001, "Hello world, it's 42 tokens-ish!"),
            (900002, "can't won't I'll we're you've I'm he'd"),
            (900003, "unicode: café naïve 42km ... !!!"),
            (900004, "a"),
        ],
        "doc_id long, text string",
    )
    corpus = docs.select("doc_id", "text").limit(50).unionByName(extra)
    got = (
        token_count(corpus, tokenizer="bpe_regex")
        .toPandas()
        .set_index("doc_id")
        .n_tokens
    )
    con = duckdb.connect()
    pat_sql = BPE_REGEX.replace("'", "''")
    for r in corpus.collect():
        esc = r["text"].replace("'", "''")
        n = con.sql(
            f"SELECT len(regexp_extract_all('{esc}', '{pat_sql}'))"
        ).fetchone()[0]
        assert got[r["doc_id"]] == n, r["text"]
    with pytest.raises(ValueError, match="unknown tokenizer"):
        token_count(corpus, tokenizer="nope")


def test_ivf_full_probe_equals_exact(spark):
    """With n_probes == n_centroids every inverted list is scanned, so IVF
    must reproduce the brute-force top-k exactly (IVF affects recall only)."""
    from sqoop_spark.pipeline import ivf_cosine_topk

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=3).toPandas()
    full = ivf_cosine_topk(
        emb, queries, k=3, n_centroids=4, n_probes=4
    ).toPandas()
    cols = ["query_id", "neighbor_id", "rank"]
    assert (
        full.sort_values(cols).reset_index(drop=True)[cols].equals(
            exact.sort_values(cols).reset_index(drop=True)[cols]
        )
    )


def test_ivf_partial_probe_scores_exact_and_recall(spark):
    """Partial-probe IVF: every emitted cosine equals the exact score (the
    approximation only prunes candidates), more probes never lose recall,
    and the sha256 portable-hash mode is deterministic."""
    from sqoop_spark.pipeline import ivf_cosine_topk

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=200).toPandas()
    exact_scores = {
        (r.query_id, r.neighbor_id): r.cosine for r in exact.itertuples()
    }
    top1 = set(
        exact[exact["rank"] == 1][["query_id", "neighbor_id"]].itertuples(
            index=False, name=None
        )
    )

    def hits(n_probes):
        got = ivf_cosine_topk(
            emb, queries, k=3, n_centroids=8, n_probes=n_probes,
            hash_fn="sha256",
        ).toPandas()
        assert len(got) > 0
        for r in got.itertuples():
            assert exact_scores[(r.query_id, r.neighbor_id)] == pytest.approx(
                r.cosine
            )
        return sum(
            (r.query_id, r.neighbor_id) in top1 for r in got.itertuples()
        )

    low, high = hits(1), hits(8)
    assert high >= low
    assert high == 5  # all-probe run recovers every true top-1


def test_cosine_topk_blas_matches_pair_join(spark):
    """cosine_topk_blas (per-batch BLAS block + map-side top-k candidates)
    must reproduce the pair-join cosine_topk: identical (query, neighbor,
    rank) sets and cosines equal to float tolerance (same dot/(|v||q|)
    math, BLAS summation order)."""
    from sqoop_spark.pipeline import cosine_topk, cosine_topk_blas

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    cols = ["query_id", "neighbor_id", "rank"]
    want = cosine_topk(emb, queries, k=7).toPandas().sort_values(cols)
    # repartition so per-batch candidate selection really runs multi-batch
    got = (
        cosine_topk_blas(emb.repartition(8), queries, k=7)
        .toPandas()
        .sort_values(cols)
    )
    assert got.reset_index(drop=True)[cols].equals(
        want.reset_index(drop=True)[cols]
    )
    assert (
        (got.reset_index(drop=True).cosine - want.reset_index(drop=True).cosine)
        .abs()
        .max()
        < 1e-9
    )


def test_ivf_index_reused_across_query_batches(spark):
    """ivf_index / ivf_search split: ONE prebuilt (checkpointed) index
    serves successive query batches with answers identical to the fused
    ivf_cosine_topk — the build cost is genuinely paid once (the IVF
    contract the docstring claims)."""
    from sqoop_spark.pipeline import ivf_cosine_topk, ivf_index, ivf_search

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    cents, index = ivf_index(emb, n_centroids=8, method="pandas")
    index = index.localCheckpoint(eager=True)
    cols = ["query_id", "neighbor_id", "rank"]
    for lo, hi in ((0, 5), (5, 10)):
        qs = emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        got = ivf_search(
            cents, index, qs, k=3, n_probes=2, method="pandas"
        ).toPandas()
        want = ivf_cosine_topk(
            emb, qs, k=3, n_centroids=8, n_probes=2, method="pandas"
        ).toPandas()
        assert got.sort_values(cols).reset_index(drop=True)[cols].equals(
            want.sort_values(cols).reset_index(drop=True)[cols]
        )


def test_ivf_stored_index_prunes_files_and_matches(spark, tmp_path):
    """ivf_store_index / ivf_search_stored: the centroid-partitioned layout
    must (a) return exactly the in-memory ivf_search answer and (b) open
    ONLY the probed centroids' files — partition pruning is the mechanism
    that turns IVF's candidate pruning into I/O pruning at 10^9 vectors."""
    from sqoop_spark.pipeline import (
        ivf_index,
        ivf_search,
        ivf_search_stored,
        ivf_store_index,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    cents, index = ivf_index(emb, n_centroids=8, method="pandas")
    path = str(tmp_path / "ivf")
    ivf_store_index(cents, index, path)

    qs = emb.filter(F.col("vec_id") < 5)
    got = ivf_search_stored(spark, path, qs, k=3, n_probes=2)
    want = ivf_search(cents, index, qs, k=3, n_probes=2, method="pandas")
    cols = ["query_id", "neighbor_id", "rank"]
    gp = got.toPandas().sort_values(cols).reset_index(drop=True)
    wp = want.toPandas().sort_values(cols).reset_index(drop=True)
    assert gp[cols].equals(wp[cols])

    # file-prune pin: the stored scan opens only probed partitions
    rows = cents.orderBy("centroid_id").collect()
    from sqoop_spark.pipeline.similarity import _make_top_cents_udf

    assignp = _make_top_cents_udf(spark, [r["_kv"] for r in rows], 2)
    probed = {
        r[0]
        for r in qs.select(
            F.explode(assignp(F.col("embedding"))).alias("c")
        ).distinct().collect()
    }
    assert len(probed) < 8  # pruning is non-trivial on this fixture
    # the SEARCH plan itself must list only probed directories' files —
    # ivf_search_stored opens the probed lists directly (basePath read),
    # so the scan's file index never even enumerates unprobed lists
    opened = {f for f in got.inputFiles() if "/centroid_id=" in f}
    assert opened, "search plan lists no index files"
    for f in opened:
        assert any(f"centroid_id={c}/" in f for c in probed), f
    # one file per centroid directory (the repartition-by-centroid contract)
    all_files = spark.read.parquet(path).inputFiles()
    dirs = {f.rsplit("/", 2)[1] for f in all_files}
    assert len(all_files) == len(dirs)


def test_ivf_centroids_deterministic(spark):
    from sqoop_spark.pipeline import ivf_centroids

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    a = ivf_centroids(emb, n_centroids=6).toPandas()
    b = ivf_centroids(emb, n_centroids=6).toPandas()
    assert len(a) == 6
    assert sorted(a.centroid_id) == list(range(6))
    assert a.sort_values("centroid_id")._kv.map(tuple).tolist() == (
        b.sort_values("centroid_id")._kv.map(tuple).tolist()
    )


def test_ivf_query_path_broadcasts(spark):
    """The probe join must broadcast the query side — the corpus is never
    re-shuffled at query time (the plan property that survives 10^9 rows)."""
    from sqoop_spark.pipeline import ivf_cosine_topk

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    plan = ivf_cosine_topk(
        emb, emb.filter(F.col("vec_id") < 3), k=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_signature_planes_constant_folded(spark):
    """Hyperplane components are literal-index expressions, so Catalyst's
    ConstantFolding must collapse them to literal arrays at plan time —
    executors do only the multiply-add fold, never dim × n_planes hashes
    per row. Pin it: no hash call survives in the optimized plan."""
    from sqoop_spark.pipeline import embedding_dedup_pairs

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    for hash_fn, fn_name in (("sha256", "sha2"), ("xxhash64", "xxhash64")):
        plan = (
            embedding_dedup_pairs(emb, threshold=0.5, hash_fn=hash_fn)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert fn_name not in plan, f"{hash_fn} components not folded"


def test_signature_sql_matches_column_expr(spark):
    """The SQL-text signature (one py4j call; sha256 components precomputed
    with hashlib) must be BIT-IDENTICAL to the original Column-built
    expression for both hash modes — the sha256 mode is what keeps the
    DuckDB value-hash oracles green, so exact (not approximate) equality."""
    from sqoop_spark.pipeline.similarity import _plane_component, _signature

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(50)
    for hash_fn in ("sha256", "xxhash64"):
        # the pre-round-3 construction, rebuilt inline from _plane_component
        bits = []
        for p in range(4):
            comps = F.array(
                *[_plane_component(F.lit(j), p, 42, hash_fn) for j in range(64)]
            )
            comp = F.aggregate(
                F.zip_with(
                    F.col("embedding"), comps, lambda x, c: x.cast("double") * c
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bits.append(
                F.when(comp >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**p)
            )
        old = bits[0]
        for b in bits[1:]:
            old = old + b
        rows = emb.select(
            _signature("embedding", 64, 4, 42, hash_fn).alias("new"),
            old.alias("old"),
        ).collect()
        assert rows and all(r.new == r.old for r in rows), hash_fn


def test_ivf_pandas_assignment_matches_expr(spark):
    """The Arrow/BLAS assignment path (one matmul per batch, no crossjoin)
    must produce the same inverted lists — and therefore the same top-k —
    as the Catalyst expression path."""
    from sqoop_spark.pipeline import ivf_cosine_topk

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    cols = ["query_id", "neighbor_id", "rank"]
    a = (
        ivf_cosine_topk(emb, queries, k=3, n_centroids=8, n_probes=2)
        .toPandas().sort_values(cols).reset_index(drop=True)
    )
    b = (
        ivf_cosine_topk(
            emb, queries, k=3, n_centroids=8, n_probes=2, method="pandas"
        )
        .toPandas().sort_values(cols).reset_index(drop=True)
    )
    assert a[cols].equals(b[cols])
    assert a.cosine.tolist() == pytest.approx(b.cosine.tolist())
    with pytest.raises(ValueError, match="unknown method"):
        ivf_cosine_topk(emb, queries, method="nope")


def test_ivf_more_centroids_than_rows(spark):
    """K larger than the corpus degrades gracefully: every row becomes its
    own centroid and the result equals brute force."""
    from sqoop_spark.pipeline import ivf_cosine_topk

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(12)
    queries = emb.filter(F.col("vec_id") < 2)
    got = ivf_cosine_topk(
        emb, queries, k=3, n_centroids=50, n_probes=50
    ).toPandas()
    exact = cosine_topk(emb, queries, k=3).toPandas()
    cols = ["query_id", "neighbor_id", "rank"]
    assert got.sort_values(cols).reset_index(drop=True)[cols].equals(
        exact.sort_values(cols).reset_index(drop=True)[cols]
    )


def test_pair_cosine_pandas_pinned_to_expr(spark):
    """The Arrow/BLAS pair-cosine path must agree with the Catalyst expr
    path (the DuckDB-oracle twin) at the 6-decimal rounding every consumer
    applies — for LSH top-k, embedding dedup, and exact top-k."""
    from sqoop_spark.pipeline import embedding_dedup_pairs

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)

    def canon(pdf, keys):
        pdf = pdf.copy()
        pdf["cosine"] = pdf["cosine"].round(6)
        return pdf.sort_values(keys).reset_index(drop=True)

    for fn, kw, keys in [
        (lsh_cosine_topk, dict(k=3), ["query_id", "neighbor_id"]),
        (cosine_topk, dict(k=5), ["query_id", "neighbor_id"]),
    ]:
        a = canon(fn(emb, queries, method="expr", **kw).toPandas(), keys)
        b = canon(fn(emb, queries, method="pandas", **kw).toPandas(), keys)
        pd.testing.assert_frame_equal(a, b)

    a = canon(
        embedding_dedup_pairs(emb, threshold=0.2, method="expr").toPandas(),
        ["id_a", "id_b"],
    )
    b = canon(
        embedding_dedup_pairs(emb, threshold=0.2, method="pandas").toPandas(),
        ["id_a", "id_b"],
    )
    pd.testing.assert_frame_equal(a, b)


def test_recommend_n_planes_sizing_rule():
    """n_planes = ceil(log2(N/target)): each added plane halves the
    expected self-join volume; the rule pins it to ~N x target pairs."""
    from sqoop_spark.pipeline.similarity import recommend_n_planes

    assert recommend_n_planes(0) == 1
    assert recommend_n_planes(1024, target_bucket_size=1024) == 1
    assert recommend_n_planes(2048, target_bucket_size=1024) == 1
    assert recommend_n_planes(1 << 20, target_bucket_size=1024) == 10
    assert recommend_n_planes(10**9, target_bucket_size=1024) == 20
    # clamp: absurd corpus sizes can't blow past 30 planes (int bucket ids)
    assert recommend_n_planes(10**18, target_bucket_size=1) == 30
    # expected bucket size under the recommendation stays <= target
    for n in (10**6, 10**8, 10**9):
        h = recommend_n_planes(n)
        assert n / 2**h <= 1024


def test_embedding_dedup_sizing_warning(spark, caplog):
    """Passing expected_rows over budget emits the sizing warning naming
    the recommended plane count (no warning when within budget)."""
    import logging

    from sqoop_spark.pipeline import embedding_dedup_pairs

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    with caplog.at_level(logging.WARNING, logger="sqoop_spark.pipeline.similarity"):
        embedding_dedup_pairs(
            emb, threshold=0.9, n_planes=4, expected_rows=10**9, pair_budget=1e12
        )
    assert any("n_planes>=" in r.getMessage() for r in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="sqoop_spark.pipeline.similarity"):
        embedding_dedup_pairs(
            emb, threshold=0.9, n_planes=4, expected_rows=1000, pair_budget=1e12
        )
    assert not caplog.records


def test_bpe_train_merges_sennrich_example():
    """The published BPE walkthrough (Sennrich et al. 2016 §3.2): on the
    low/lower/newest/widest corpus the first merges are the est/lo pairs."""
    from sqoop_spark.pipeline.text import train_bpe_merges

    corpus = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    merges = train_bpe_merges([" ".join(corpus)], n_merges=4)
    # pre-tokenizer attaches the leading space, so words appear both bare
    # (first occurrence) and space-prefixed; 'es' (freq 9) merges first,
    # then 'est' (9)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")


def test_bpe_train_distributed_twin_no_driver_materialization(spark, docs):
    """train_bpe_merges_df (executor-side counting) must produce the
    IDENTICAL merge table as the driver trainer — same greedy argmax, same
    count-desc/lexicographic tie-break, same <2 stop — while the driver
    only ever collects single argmax rows (the counting pass is never
    materialized driver-side; the corpus working set stays distributed)."""
    from sqoop_spark.pipeline.text import train_bpe_merges, train_bpe_merges_df

    # the published Sennrich corpus first (exact early merges known) ...
    corpus = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    sennrich = [" ".join(corpus)]
    # ... then real documents (punctuation, digits, space-prefixed tokens)
    texts = [r.text for r in docs.limit(30).collect()]

    for sample, n in ((sennrich, 12), (texts, 25)):
        want = train_bpe_merges(sample, n_merges=n)
        df = spark.createDataFrame([(t,) for t in sample], "text string")
        collected_sizes: list[int] = []
        # patch the RUNTIME DataFrame class (pyspark 4's classic concrete
        # class overrides collect, so the abstract base never dispatches)
        dfcls = type(df)
        orig_collect = dfcls.collect

        def spy(self, *a, **kw):
            out = orig_collect(self, *a, **kw)
            collected_sizes.append(len(out))
            return out

        dfcls.collect = spy
        try:
            got = train_bpe_merges_df(df, n_merges=n, checkpoint_every=5)
        finally:
            dfcls.collect = orig_collect
        assert got == want
        # every driver round-trip during training is exactly the 1-row argmax
        assert collected_sizes and max(collected_sizes) <= 1

    # early stop: a corpus where no pair reaches frequency 2
    one = spark.createDataFrame([("ab cd",)], "text string")
    assert train_bpe_merges_df(one, n_merges=10) == train_bpe_merges(["ab cd"], 10)


def test_bpe_encode_matches_reference_twin(spark):
    """bpe_encode (broadcast ranks + memoized pandas UDF) must reproduce a
    straightforward independent apply-merges-in-order implementation on
    fixed strings, token for token."""
    import regex as re2

    from sqoop_spark.pipeline.text import BPE_REGEX, bpe_encode, train_bpe_merges

    texts = [
        "the lowest low is lower than the newest newt",
        "widest wide width, and the west was won",
        "low low low lower lowest",
        "",
    ]
    merges = train_bpe_merges(texts, n_merges=50)
    assert len(merges) > 5

    def twin(text):
        # independent semantics: apply each merge rule exhaustively in
        # table order (equivalent to rank-priority for a table produced by
        # greedy training on this corpus)
        toks = []
        for w in re2.findall(BPE_REGEX, text):
            syms = list(w)
            for a, b in merges:
                i = 0
                while i < len(syms) - 1:
                    if syms[i] == a and syms[i + 1] == b:
                        syms[i : i + 2] = [a + b]
                    else:
                        i += 1
            toks.extend(syms)
        return toks

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {r.doc_id: list(r.tokens) for r in bpe_encode(df, merges).collect()}
    for i, t in enumerate(texts):
        assert got[i] == twin(t), (i, got[i], twin(t))
    # count column consistent and reconstruction lossless
    out = bpe_encode(df, merges).collect()
    for r in out:
        assert r.n_tokens == len(r.tokens)
    assert "".join(got[0]) == texts[0]


def test_bpe_encode_on_documents(spark, docs):
    """End-to-end on the corpus: trained merges compress the pre-token
    stream (fewer symbols than characters, more than pre-tokens)."""
    from sqoop_spark.pipeline.text import bpe_encode, token_count, train_bpe_merges

    sample = [r.text for r in docs.limit(50).collect()]
    merges = train_bpe_merges(sample, n_merges=100)
    sub = docs.filter(F.col("doc_id") < 50)
    enc = bpe_encode(sub, merges).toPandas().set_index("doc_id")
    pre = token_count(sub, tokenizer="bpe_regex").toPandas().set_index("doc_id")
    chars = sub.select("doc_id", F.length("text").alias("n")).toPandas().set_index("doc_id")
    assert (enc.n_tokens >= pre.n_tokens).all()
    assert (enc.n_tokens <= chars.n).all()
    # lossless: concatenating tokens rebuilds the document
    txts = {r.doc_id: r.text for r in sub.collect()}
    for did, row in enc.iterrows():
        assert "".join(row.tokens) == txts[did]


def test_connected_components_transitive_chain(spark):
    """A~B, B~C with no direct A~C pair must collapse into ONE cluster
    labelled by the minimum id; disjoint components keep separate labels;
    a diameter-3 chain converges (needs >1 propagation round)."""
    from sqoop_spark.pipeline import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    got = {
        r.id: r.cluster_id for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20, 23: 20}


def test_connected_components_matches_embedding_oracle(spark):
    """Cluster labels over the real embedding near-dup pair graph equal a
    driver-style python reference (union-find closure over the same pairs)."""
    from sqoop_spark.pipeline import connected_components, embedding_dedup_pairs

    embs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    pairs = embedding_dedup_pairs(embs, threshold=0.2, hash_fn="sha256")
    pair_rows = [(r.id_a, r.id_b) for r in pairs.collect()]
    # python reference: union-find
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in pair_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    got = {r.id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == want


def test_dedup_resolve_keep_policy(spark):
    """Keep-policy end of the dedup pipeline: per cluster the highest
    score survives (ties to smallest id); singletons always survive."""
    from sqoop_spark.pipeline import dedup_resolve

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)], "id LONG, cluster_id LONG"
    )
    docs = spark.createDataFrame(
        # cluster 1: doc 2 longest; cluster 10: tie -> doc 10; 99 singleton
        [(1, 5), (2, 9), (3, 7), (10, 4), (11, 4), (99, 1)],
        "doc_id LONG, n_chars INT",
    )
    got = {
        (r.doc_id, r.cluster_id, r.keep)
        for r in dedup_resolve(docs, clusters, "n_chars").collect()
    }
    assert got == {
        (1, 1, False),
        (2, 1, True),
        (3, 1, False),
        (10, 10, True),
        (11, 10, False),
        (99, 99, True),
    }


def test_filter_documents_reasons(spark):
    """Every threshold branch of the quality gate fires, first-match-wins
    order as documented; keep == (drop_reason == '')."""
    from sqoop_spark.pipeline import filter_documents

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and runs far away home"),
            (2, "x"),                                  # too_short
            (3, "a b " * 30),                          # mean_tok_len_low (chars ok)
            (4, "supercalifragilistic " * 10),         # mean_tok_len_high
            (5, "zebra quartz " * 12),                 # stopword_ratio_low
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        r.doc_id: (r.drop_reason, r.keep)
        for r in filter_documents(
            docs, min_chars=20, min_tokens=5, min_mean_tok_len=3.0,
            max_mean_tok_len=8.0, min_stopword_ratio=0.01,
        ).collect()
    }
    assert got[1] == ("", True)
    assert got[2] == ("too_short", False)
    assert got[3] == ("mean_tok_len_low", False)
    assert got[4] == ("mean_tok_len_high", False)
    assert got[5] == ("stopword_ratio_low", False)


def test_filter_documents_null_text_dropped(spark):
    """NULL text must not slip through the gate via NULL comparisons —
    it gets an explicit null_text drop reason."""
    from sqoop_spark.pipeline import filter_documents

    docs = spark.createDataFrame(
        [(1, None), (2, "the quick brown fox jumps over the lazy dog at home")],
        "doc_id LONG, text STRING",
    )
    got = {
        r.doc_id: (r.drop_reason, r.keep)
        for r in filter_documents(
            docs, min_chars=20, min_tokens=5, min_mean_tok_len=3.0,
            max_mean_tok_len=8.0, min_stopword_ratio=0.01,
        ).collect()
    }
    assert got[1] == ("null_text", False)
    assert got[2] == ("", True)


def test_repetition_score_closed_form(spark):
    """dup-token and top-token fractions on hand-computable docs."""
    from sqoop_spark.pipeline import repetition_score

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),          # 4 tokens, 1 distinct -> dup .75, top 1.0
            (2, "a b c d"),          # all distinct -> dup 0, top .25
            (3, "a a b b b c"),      # 6 tokens, 3 distinct -> dup .5, top .5
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        r.doc_id: (r.n_tokens, r.dup_token_frac, r.top_token_frac)
        for r in repetition_score(docs).collect()
    }
    assert got == {
        1: (4, 0.75, 1.0),
        2: (4, 0.0, 0.25),
        3: (6, 0.5, 0.5),
    }


def test_redact_pii_closed_form(spark):
    """Emails and phones replaced with placeholders; counts audit what
    was removed; clean text untouched elsewhere."""
    from sqoop_spark.pipeline import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "mail alice@example.com or bob.smith+x@sub.domain.org today"),
            (2, "call 555-123-4567 and 555-000-9999"),
            (3, "no pii here 12345"),
            (4, "mix: c@d.io 111-222-3333"),
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        r.doc_id: (r.clean, r.n_emails, r.n_phones)
        for r in redact_pii(docs).collect()
    }
    assert got[1] == ("mail [EMAIL] or [EMAIL] today", 2, 0)
    assert got[2] == ("call [PHONE] and [PHONE]", 0, 2)
    assert got[3] == ("no pii here 12345", 0, 0)
    assert got[4] == ("mix: [EMAIL] [PHONE]", 1, 1)


def test_repetition_score_2gram_closed_form(spark):
    """n=2: non-distinct bigrams; docs shorter than n report zero grams
    and zero fractions instead of vanishing from the result."""
    from sqoop_spark.pipeline import repetition_score

    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),   # bigrams: ab ba ab ba -> 4 grams, 2 distinct
            (2, "x y z"),       # xy yz -> all distinct
            (3, "solo"),        # no bigrams -> zero counts, still present
            (4, None),          # NULL text -> zero counts, still present
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        r.doc_id: (r.n_tokens, r.dup_token_frac, r.top_token_frac)
        for r in repetition_score(docs, n=2).collect()
    }
    assert got == {
        1: (4, 0.5, 0.5),
        2: (2, 0.0, 0.5),
        3: (0, 0.0, 0.0),
        4: (0, 0.0, 0.0),
    }


def test_bpe_pretokenizer_unicode_whitespace_parity(spark):
    """BPE_REGEX pins an EXPLICIT ASCII whitespace class: a bare \\s is
    ASCII-only in Java (Spark) and RE2 (DuckDB) but Unicode-aware in
    Python's `regex` module, so NBSP/U+2000-range whitespace used to
    tokenize differently between the distributed trainer/encoder and the
    driver twin. All three engines must now agree token-for-token."""
    import duckdb
    import regex as _re

    from sqoop_spark.pipeline.text import BPE_REGEX, train_bpe_merges, train_bpe_merges_df

    s = "café\u00a0costs 12\u2009euros,\u00a0ok?  \tdone"
    py = _re.compile(BPE_REGEX).findall(s)
    dd = duckdb.sql(
        "select regexp_extract_all(?, ?)", params=[s, BPE_REGEX]
    ).fetchone()[0]
    jv = (
        spark.createDataFrame([(s,)], "text string")
        .select(
            F.regexp_extract_all(F.col("text"), F.lit(BPE_REGEX), 0).alias("t")
        )
        .collect()[0]["t"]
    )
    assert py == dd == jv, (py, dd, jv)

    # and the twin trainers still agree on an NBSP-bearing corpus
    texts = [s, "plain ascii text here", s + " more café"]
    want = train_bpe_merges(texts, n_merges=6)
    got = train_bpe_merges_df(
        spark.createDataFrame([(t,) for t in texts], "text string"), n_merges=6
    )
    assert got == want


def test_cosine_topk_blas_empty_queries(spark, tmp_path):
    """Empty query set: the BLAS path and the stored IVF search must
    return an empty frame like the pair-join twin — same COLUMN TYPES as
    their non-empty results (the schema must not flip with the row
    count), not crash in np.stack or raise a misleading index error."""
    from sqoop_spark.pipeline import (
        cosine_topk,
        cosine_topk_blas,
        ivf_index,
        ivf_search_stored,
        ivf_store_index,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    none = emb.filter(F.col("vec_id") < 0)
    got = cosine_topk_blas(emb, none, k=3)
    want = cosine_topk(emb, none, k=3)
    full = cosine_topk_blas(emb, emb.filter(F.col("vec_id") < 2), k=3)
    def nt(df):
        return [(f.name, f.dataType) for f in df.schema.fields]

    assert got.count() == want.count() == 0
    # empty and non-empty agree on names AND types (nullability of an
    # empty frame is irrelevant to union compatibility)
    assert nt(got) == nt(full)
    assert [f.name for f in got.schema.fields] == [
        f.name for f in want.schema.fields
    ]

    cents, index = ivf_index(emb, n_centroids=4, method="pandas")
    path = str(tmp_path / "ivf_empty")
    ivf_store_index(cents, index, path)
    got_st = ivf_search_stored(spark, path, none, k=3, n_probes=2)
    full_st = ivf_search_stored(
        spark, path, emb.filter(F.col("vec_id") < 2), k=3, n_probes=2
    )
    assert got_st.count() == 0
    assert nt(got_st) == nt(full_st)


def test_cap_per_group_matches_model_and_plan(spark):
    """Per-group quota: equals the pandas row_number model; the plan
    carries WindowGroupLimit (map-side partial top-n per group — the
    skew-immunity property the docstring claims); guard matrix."""
    from sqoop_spark.errors import EngineError
    from sqoop_spark.pipeline import cap_per_group

    rows = [
        (i, f"src{i % 3}", (i * 37) % 100) for i in range(200)
    ] + [(1000 + i, "mega", i % 7) for i in range(500)]  # skewed group
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    out = cap_per_group(
        df, ["source"], [F.col("n_chars").desc(), F.col("doc_id")], 5
    )
    got = sorted((r.source, r.doc_id) for r in out.collect())
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "n_chars"])
    pdf = pdf.sort_values(
        ["source", "n_chars", "doc_id"], ascending=[True, False, True]
    )
    pdf["rk"] = pdf.groupby("source").cumcount() + 1
    want = sorted(
        (r.source, r.doc_id) for r in pdf[pdf.rk <= 5].itertuples()
    )
    assert got == want
    assert not any(c.startswith("__cap_per_group") for c in out.columns)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    # a caller's own column with the internal name survives untouched
    df2 = df.withColumn("__cap_per_group_rank", F.lit(7))
    out2 = cap_per_group(
        df2, ["source"], [F.col("n_chars").desc(), F.col("doc_id")], 5
    )
    assert "__cap_per_group_rank" in out2.columns
    assert out2.select("__cap_per_group_rank").distinct().collect()[0][0] == 7
    with pytest.raises(EngineError, match="n must be"):
        cap_per_group(df, ["source"], ["doc_id"], 0)
    with pytest.raises(EngineError, match="non-empty"):
        cap_per_group(df, [], ["doc_id"], 5)


def test_vocab_top_k_model_ties_and_plan(spark):
    """Vocabulary build: counts + deterministic tie-break vs a pure-Python
    model over mixed whitespace; top-k planned as TakeOrdered (no global
    sort shuffle) over a map-side-combined aggregate."""
    from collections import Counter

    from sqoop_spark.pipeline import vocab_top_k

    texts = [
        "The quick\tbrown fox\njumps over the lazy dog",
        "the DOG barks\r\nthe fox runs  fast",
        "zz aa zz aa",  # exact ties -> token-text tie-break
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    out = vocab_top_k(df, k=5)
    got = [(r.tok, r.n) for r in out.collect()]
    c = Counter()
    for t in texts:
        import re as _re
        for tok in _re.split(r"[ \t\r\n]+", t.lower()):
            if tok:
                c[tok] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "partial_count" in plan or "partial count" in plan.lower(), plan
