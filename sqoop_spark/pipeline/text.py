"""Text-analysis operators (language-ID, quality, tokens, fingerprints).

Training-data-pipeline surface over the documents corpus. Every operator is
pure built-in-function Catalyst (whole-stage codegen, no UDFs) and each has
a closed-form SQL twin, so the driver's DuckDB oracle can verify values —
the expressions deliberately use only constructs both engines share
(length/replace counting, split, sha2/sha256, min).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from sqoop_spark.pipeline.dedup import _shingles

#: Marker-token profiles for the n-gram language heuristic. Scores are
#: occurrence counts of each marker (as a substring with space guards);
#: argmax wins, ties broken by profile order. Deliberately tiny — a real
#: deployment would load trained trigram profiles; the *shape* (profile
#: scoring entirely in the scan projection) is the point.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "fast"],
    "de": ["der", "und", "nicht"],
    "es": ["el", "que", "los"],
    "fr": ["le", "la", "les"],
    "zh": ["de", "shi", "bu"],
}

STOPWORDS = ["the", "a", "and", "of"]


def _count_occurrences(text: Column, token: str) -> Column:
    """Whole-word occurrence count on the single-space tokenization:
    size(filter(split(text), x -> x == token)). Higher-order array
    functions exist identically in DuckDB (``list_filter``), so the oracle
    uses the same expression — and both stay out of the regex engines,
    whose dialects differ."""
    return F.size(F.filter(F.split(text, " "), lambda x: x == F.lit(token)))


#: GPT-2-style pre-tokenizer pattern: contraction suffixes, space-prefixed
#: letter runs, digit runs, punctuation runs, whitespace runs. Uses only
#: constructs Java regex (Spark), RE2 (DuckDB) and Python's ``regex``
#: module interpret identically — \p{L}/\p{N} unicode classes,
#: non-capturing alternation, and an EXPLICIT ASCII whitespace class:
#: a bare ``\s`` is ASCII-only in Java/RE2 but Unicode-aware in Python's
#: ``regex`` module, so NBSP/U+2000-range whitespace would tokenize
#: differently between the Spark/DuckDB side and the driver-side
#: trainer/encoder. Verified token-for-token across engines in tests
#: (incl. an NBSP fixture) and by the driver oracle.
_BPE_WS = r" \t\n\x0B\f\r"
BPE_REGEX = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+"
    rf"| ?[^{_BPE_WS}\p{{L}}\p{{N}}]+|[{_BPE_WS}]+"
)


def token_count(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer: str = "whitespace",
) -> DataFrame:
    """Token count per document.

    ``tokenizer``: "whitespace" (the corpus' single-space tokenization) or
    "bpe_regex" (the GPT-2-ish pre-tokenizer split — the unit an LLM
    data pipeline budgets by). Both run as one scan projection inside
    whole-stage codegen; at 100 TB this is the cheapest possible shape
    (no shuffle, no UDF, column-pruned to ``text``).
    """
    if tokenizer == "whitespace":
        n = F.size(F.split(F.col(text_col), " "))
    elif tokenizer == "bpe_regex":
        n = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_REGEX), 0))
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    return df.select(F.col(id_col), n.alias("n_tokens"))


def vocab_top_k(
    df: DataFrame,
    text_col: str = "text",
    k: int = 100,
    lowercase: bool = True,
) -> DataFrame:
    """Corpus vocabulary: the ``k`` most frequent whitespace tokens with
    counts — the vocabulary-seeding pass of a tokenizer-training
    pipeline (and the stopword/frequency table quality filters consume).

    Scale shape: explode is a per-row flatMap (no shuffle), the count is
    ONE map-side-combined groupBy over the token column (partial
    aggregation before the exchange — the corpus never ships raw
    tokens), and the top-k is ``TakeOrdered`` (per-partition heaps, no
    global sort shuffle). Ties at the boundary break on the token text,
    so the result is total-order deterministic — the property the
    DuckDB twin needs. The whitespace class is the explicit ASCII
    ``[ \\t\\r\\n]+`` on BOTH engines (the bare ``\\s`` Java/RE2/Python
    divergence documented at :data:`BPE_REGEX`)."""
    toks = F.split(
        F.lower(F.col(text_col)) if lowercase else F.col(text_col),
        r"[ \t\r\n]+",
    )
    return (
        df.select(F.explode(toks).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(k)
    )


def train_bpe_merges(texts: list[str], n_merges: int = 200) -> list[tuple[str, str]]:
    """Greedy BPE merge-table training (Sennrich et al. 2016, the public
    algorithm): start from characters, repeatedly merge the most frequent
    adjacent symbol pair. Driver-side and tiny by design — training is a
    one-off offline step; the *engine* artifact is the merge table that
    ``bpe_encode`` broadcasts. Ties break lexicographically for bitwise
    determinism across runs/hosts."""
    import regex as _re

    pat = _re.compile(BPE_REGEX)
    word_freq: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in pat.findall(t):
            k = tuple(w)
            word_freq[k] = word_freq.get(k, 0) + 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, f in word_freq.items():
            for a, b in zip(w, w[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        (a, b), best_n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best_n < 2:
            break
        merges.append((a, b))
        merged = a + b
        new_freq: dict[tuple[str, ...], int] = {}
        for w, f in word_freq.items():
            out, i = [], 0
            while i < len(w):
                if i + 1 < len(w) and w[i] == a and w[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            k = tuple(out)
            new_freq[k] = new_freq.get(k, 0) + f
        word_freq = new_freq
    return merges


def train_bpe_merges_df(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    checkpoint_every: int = 10,
) -> list[tuple[str, str]]:
    """Distributed greedy BPE merge-table training — bitwise-identical to
    ``train_bpe_merges`` (pytest twin equality) with every counting pass
    executor-side, the shape that survives a 100 TB corpus:

    - ONE corpus scan: pre-tokenize (the shared ``BPE_REGEX``), explode,
      map-side-combined groupBy word → the (symbols, freq) working set.
      From here on the corpus is never touched again; the working set is
      O(unique pre-tokens), Zipf-compressed far below corpus size — and it
      stays DISTRIBUTED (never collected), so vocabularies that dwarf
      driver memory (code identifiers) are fine.
    - per merge iteration: adjacent-pair counts as explode →
      map-side-combined groupBy → ``sum(freq)``; the driver collects
      exactly ONE row (the argmax merge, ties broken by count desc then
      lexicographic pair — UTF-8 binary order equals code-point order, so
      Spark's string sort matches the driver trainer's Python tie-break).
      The winning merge is applied to the symbol arrays JVM-side with an
      ``aggregate`` fold (left-to-right, non-overlapping — the same greedy
      scan as the driver trainer's while loop).

    Lineage is cut with ``localCheckpoint`` every ``checkpoint_every``
    iterations so the plan stays O(1) across hundreds of merges (the
    connected-components pattern, dedup.py). Stops early when no adjacent
    pair occurs at least twice, like the driver trainer.
    """
    spark = df.sparkSession
    empty = F.array().cast("array<string>")
    words = (
        df.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(BPE_REGEX), 0)
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        # (?s). matches one CODE POINT in Java regex — the same character
        # unit as the driver trainer's tuple(w) (plain split("") works on
        # UTF-16 units and would shear surrogate pairs).
        .select(
            F.regexp_extract_all("w", F.lit(r"(?s)."), 0).alias("syms"), "freq"
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        top = (
            words.select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        merged = a + b
        fold = F.aggregate(
            "syms",
            empty,
            # try_element_at: NULL (not an ANSI error) on the empty
            # accumulator; NULL == a is NULL, so the otherwise-branch fires.
            lambda acc, x: F.when(
                (F.try_element_at(acc, F.lit(-1)) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1),
                    F.array(F.lit(merged)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        words = words.select(fold.alias("syms"), "freq")
        if (i + 1) % checkpoint_every == 0:
            words = words.localCheckpoint(eager=True)
    return merges


def _bpe_apply(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one pre-token: repeatedly merge the lowest-rank adjacent
    pair (the standard rank-priority BPE apply loop)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Merge-table-driven BPE tokenization — the TRUE token unit an LLM
    pipeline budgets by (``token_count(tokenizer='bpe_regex')`` counts only
    pre-tokens). Returns (id, tokens array<string>, n_tokens).

    Spark shape: the merge table broadcasts once (ranks dict, exactly like
    a production tokenizer vocab); encoding runs as an Arrow-batched
    pandas UDF with a per-executor memo of already-encoded pre-tokens —
    Zipf's law makes the cache hit rate extreme, so per-batch work is
    ~unique-token encodes + dict lookups, not per-occurrence merge loops.
    No shuffle: this is a scan projection, the only shape that matters
    over 10^12 documents."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    spark = df.sparkSession
    ranks_bc = spark.sparkContext.broadcast(
        {pair: i for i, pair in enumerate(merges)}
    )

    def _encode(texts):
        import regex as _re

        pat = _re.compile(BPE_REGEX)
        ranks = ranks_bc.value
        memo: dict[str, list[str]] = {}
        out = []
        for t in texts:
            toks: list[str] = []
            for w in pat.findall(t or ""):
                enc = memo.get(w)
                if enc is None:
                    enc = _bpe_apply(w, ranks)
                    memo[w] = enc
                toks.extend(enc)
            out.append(toks)
        return pd.Series(out)

    udf = pandas_udf(_encode, "array<string>")
    return df.select(
        F.col(id_col),
        udf(F.col(text_col)).alias("tokens"),
    ).withColumn("n_tokens", F.size("tokens"))


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic quality features: length, token stats, stopword ratio.

    Mirrors the standard pretraining-corpus filters (length bounds,
    stopword share, mean word length) as one scan projection.
    """
    t = F.col(text_col)
    n_tokens = F.size(F.split(t, " "))
    stop_hits = None
    for w in STOPWORDS:
        c = _count_occurrences(t, w)
        stop_hits = c if stop_hits is None else (stop_hits + c)
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (F.length(t) / n_tokens).alias("mean_tok_len"),
        (stop_hits / n_tokens).alias("stopword_ratio"),
    )


def lang_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """N-gram-profile language guess: argmax of marker occurrence scores.

    Deterministic tie-break: first profile in LANG_PROFILES order wins
    (implemented as strict > against the running best).
    """
    t = F.col(text_col)
    scores = {
        lang: sum(
            (_count_occurrences(t, m) for m in markers), F.lit(0)
        )
        for lang, markers in LANG_PROFILES.items()
    }
    langs = list(LANG_PROFILES)
    best_lang = F.lit(langs[0])
    best_score = scores[langs[0]]
    for lang in langs[1:]:
        is_better = scores[lang] > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)
    return df.select(
        F.col(id_col), best_lang.alias("lang_pred"), best_score.alias("lang_score")
    )


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """Winnowing-style fingerprint: lexicographic min of sha256(k-shingle).

    The distributed shape of MOSS-style fingerprinting — explode shingles,
    hash, min-aggregate. sha256 keeps the Spark and DuckDB sides
    bit-identical (both emit lowercase hex).
    """
    sh = _shingles(df, text_col, k)
    return sh.groupBy(F.col(id_col)).agg(
        F.min(F.sha2(F.col("_shingle"), 256)).alias("fingerprint")
    )


def filter_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 50,
    max_chars: int = 100_000,
    min_tokens: int = 10,
    min_mean_tok_len: float = 2.0,
    max_mean_tok_len: float = 12.0,
    min_stopword_ratio: float = 0.0,
) -> DataFrame:
    """C4/Gopher-style quality gate: the composed keep/drop decision over
    the quality_score features, as ONE scan projection (no join back —
    the features are recomputed inline, which Catalyst collapses into the
    same codegen stage; at 100 TB a join against a features table would
    shuffle the corpus for nothing).

    Returns every document with its features, a ``keep`` flag and a
    ``drop_reason`` ('' when kept — the audit column a curation pipeline
    ships so filtering is explainable and thresholds are tunable offline).
    Thresholds follow the published heuristics (C4: length + stopword
    presence; Gopher: mean-word-length window 2–10, doc length windows);
    values here are the knobs, not the point.
    """
    t = F.col(text_col)
    n_tokens = F.size(F.split(t, " "))
    stop_hits = None
    for w in STOPWORDS:
        c = _count_occurrences(t, w)
        stop_hits = c if stop_hits is None else (stop_hits + c)
    n_chars = F.length(t)
    mean_tok = n_chars / n_tokens
    stop_ratio = stop_hits / n_tokens
    reason = (
        # NULL text makes every threshold comparison NULL, which would fall
        # through to the keep branch — gate it explicitly first.
        F.when(t.isNull(), F.lit("null_text"))
        .when(n_chars < min_chars, F.lit("too_short"))
        .when(n_chars > max_chars, F.lit("too_long"))
        .when(n_tokens < min_tokens, F.lit("too_few_tokens"))
        .when(mean_tok < min_mean_tok_len, F.lit("mean_tok_len_low"))
        .when(mean_tok > max_mean_tok_len, F.lit("mean_tok_len_high"))
        .when(stop_ratio < min_stopword_ratio, F.lit("stopword_ratio_low"))
        .otherwise(F.lit(""))
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        reason.alias("drop_reason"),
        (reason == "").alias("keep"),
    )


def repetition_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 1
) -> DataFrame:
    """Gopher-style repetition features: the share of duplicate n-grams
    and the share taken by the single most frequent n-gram — high values
    flag the boilerplate/spam documents repetition filters drop (Gopher
    uses exactly this family: duplicate word fraction plus top-2/3/4-gram
    fractions).

    Shape: explode → one map-side-combined count on (doc, gram) → one
    per-doc aggregate. The (doc, gram) key is near-unique, so the first
    groupBy's partial aggregation collapses almost everything before the
    shuffle; no UDFs, no corpus-wide key (each doc's grams stay
    together only logically — the hash spread is uniform). ``n > 1``
    builds NON-distinct n-grams JVM-side (``transform`` over a
    ``sequence`` of start offsets — unlike the dedup shingles, which
    deliberately dedupe).
    """
    t = F.col(text_col)
    if n == 1:
        grams = F.split(t, " ")
    else:
        ngrams = F.expr(
            f"transform(sequence(1, size(split({text_col}, ' ')) - {n - 1}), "
            f"i -> concat_ws(' ', slice(split({text_col}, ' '), i, {n})))"
        )
        grams = F.when(F.size(F.split(t, " ")) >= n, ngrams).otherwise(
            F.array().cast("array<string>")
        )
    # explode_outer keeps documents with no grams (shorter than n tokens,
    # or NULL text) as a single NULL-gram row, so every input doc appears
    # in the result with zero counts instead of silently vanishing.
    tok = df.select(F.col(id_col), F.explode_outer(grams).alias("w"))
    cnt = tok.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("c"))
    c0 = F.when(F.col("w").isNull(), F.lit(0)).otherwise(F.col("c"))
    return (
        cnt.groupBy(id_col)
        .agg(
            F.sum(c0).alias("_n"),
            F.max(c0).alias("_mx"),
            F.count(F.when(F.col("w").isNotNull(), F.lit(1))).alias("_d"),
        )
        .select(
            F.col(id_col),
            F.col("_n").cast("int").alias("n_tokens"),
            F.when(
                F.col("_n") > 0,
                F.round(F.lit(1.0) - F.col("_d") / F.col("_n"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_token_frac"),
            F.when(F.col("_n") > 0, F.round(F.col("_mx") / F.col("_n"), 6))
            .otherwise(F.lit(0.0))
            .alias("top_token_frac"),
        )
    )


#: Conservative PII patterns — character classes and bounded quantifiers
#: only, so Java regex (Spark) and RE2 (DuckDB) interpret them
#: identically (no backreferences, no lookaround).
PII_EMAIL_REGEX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_REGEX = r"\d{3}-\d{3}-\d{4}"


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrubbing as one scan projection: replace emails and
    NNN-NNN-NNNN phone numbers with ``[EMAIL]``/``[PHONE]`` placeholders
    and count what was removed (the audit numbers a curation pipeline
    reports). Emails are replaced before phones so the two passes compose
    deterministically; everything is JVM-side ``regexp_replace`` /
    ``regexp_extract_all`` inside whole-stage codegen — the cheapest
    possible shape for a 100 TB scrub pass, and the counts let the
    pipeline alert on corpora with unexpected PII density instead of
    silently rewriting them."""
    t = F.col(text_col)
    clean = F.regexp_replace(
        F.regexp_replace(t, PII_EMAIL_REGEX, "[EMAIL]"),
        PII_PHONE_REGEX,
        "[PHONE]",
    )
    return df.select(
        F.col(id_col),
        clean.alias("clean"),
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_REGEX), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(t, F.lit(PII_PHONE_REGEX), F.lit(0))).alias(
            "n_phones"
        ),
    )
