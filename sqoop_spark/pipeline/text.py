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
#: constructs Java regex (Spark) and RE2 (DuckDB) interpret identically
#: (\p{L}/\p{N} unicode classes, non-capturing alternation) — verified
#: token-for-token across engines in tests and by the driver oracle.
BPE_REGEX = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


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
