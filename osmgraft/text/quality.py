"""Text-quality operators: language-ID, quality scoring, token counts,
fingerprints — all JVM-side expressions (portable to the SQL oracle).

These are the text-analysis primitives a large-scale training-data pipeline
runs over every document; they deliberately avoid UDFs so they ride
whole-stage codegen and the expressions can be mirrored 1:1 in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker-word tables for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ["the", "a", "of", "and"],
    "fr": ["le", "la", "et", "des"],
    "de": ["der", "die", "und", "ein"],
    "es": ["el", "los", "las", "una"],
}

STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is", "it", "for"]


def _word_hits(text: Column, word: str) -> Column:
    """Occurrences of ` word ` in ` text ` (space-padded containment count).

    Single spaces are DOUBLED before counting: non-overlapping replace
    would otherwise consume the shared delimiter between adjacent
    occurrences ('the the' counted 1) — with doubled spaces every
    occurrence owns both its delimiters (round-2 fix; the SQL mirror in
    contract_text._hits_sql applies the same doubling)."""
    padded = F.concat(
        F.lit(" "),
        F.replace(F.lower(text), F.lit(" "), F.lit("  ")),
        F.lit(" "),
    )
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def lang_score(text: Column, lang: str) -> Column:
    s = None
    for wrd in LANG_MARKERS[lang]:
        h = _word_hits(text, wrd)
        s = h if s is None else s + h
    return s


def language_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Marker-word language classifier; ties broken by language code order."""
    t = F.col(text_col)
    scored = docs.select(
        F.col(id_col),
        *[lang_score(t, lg).alias(f"score_{lg}") for lg in LANG_MARKERS],
    )
    # argmax via greatest + when-ladder (deterministic tie-break: en,fr,de,es)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in LANG_MARKERS])
    pred = F.when(best <= 0, F.lit("und"))
    for lg in LANG_MARKERS:
        pred = pred.when(F.col(f"score_{lg}") == best, F.lit(lg))
    return scored.select(id_col, pred.alias("pred_lang"), best.alias("marker_hits"))


def token_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Whitespace tokens + a BPE-ish proxy (4 chars ≈ 1 token) per doc."""
    toks = F.size(F.split(F.col(text_col), " "))
    return docs.select(
        F.col(id_col),
        toks.alias("n_tokens"),
        F.ceil(F.length(F.col(text_col)) / 4.0).cast("long").alias("n_bpe_est"),
    )


def quality_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Length / punctuation / stopword heuristic quality score in [0, 1]."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = F.size(F.split(t, " "))
    stop_hits = None
    for wrd in STOPWORDS:
        h = _word_hits(t, wrd)
        stop_hits = h if stop_hits is None else stop_hits + h
    stop_ratio = stop_hits / n_tokens  # split('') is [''] ⇒ n_tokens ≥ 1
    mean_tok_len = n_chars / n_tokens
    # empty text: n_chars = 0 and ANSI mode (Spark 4 default) turns the
    # division into a DIVIDE_BY_ZERO crash — define alpha_ratio as 0
    alpha_ratio = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(t, "[^a-zA-Z ]", "")) / n_chars,
    ).otherwise(F.lit(0.0))
    score = (
        F.least(F.lit(1.0), n_tokens / F.lit(64.0)) * 0.4
        + F.least(F.lit(1.0), stop_ratio * 5.0) * 0.2
        + alpha_ratio * 0.4
    )
    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.round(mean_tok_len, 4).alias("mean_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def text_fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Normalization fingerprint (case/whitespace-insensitive md5) + a
    64-bit content hash — the document identity keys for dedup joins."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    return docs.select(
        F.col(id_col),
        F.md5(norm).alias("fingerprint"),
        F.xxhash64(norm).alias("content_hash64"),
    )
