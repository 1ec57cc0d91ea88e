"""Text-analysis operators for LLM training-data pipelines.

All pure Catalyst expressions (no Python in the hot path): token counting,
quality scoring, language ID, and document fingerprinting each compile to
a shuffle-free projection over the documents table — at 100 TB these run
at scan speed with full column pruning.

These extend the reference's surface (north star BASELINE.json): the
reference's only text operator is the emoji regex scan
(reference project/data_quality_checker.py:197-223).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf string annotations resolve here
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# whitespace tokenizer shared by every operator (and mirrored in oracle SQL)
def tokens(col: Column | str, lowercase: bool = True) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    return F.split(F.trim(c), r"\s+")


# BPE-ish subword proxy: alnum runs, punctuation as single tokens
BPE_ISH_PATTERN = r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col, lowercase=False))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Regex-token count approximating a subword tokenizer's granularity."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


_STOPWORDS = (
    "the a an and or of to in is are was were on for with as at by it this that".split()
)

# marker stopwords per language for the n-gram/stopword language-ID heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "de", "et", "les"),
    "de": ("der", "die", "das", "und", "ist"),
    "zh": ("的", "是", "了", "在", "我"),
}


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    toks = tokens(col)
    sw = stopwords or _STOPWORDS
    n_sw = F.size(F.filter(toks, lambda t: t.isin(sw)))
    return n_sw / F.greatest(F.size(toks), F.lit(1))


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: length, token stats, punctuation and
    stopword ratios, and a composite score.

    Deliberately NO rounding anywhere: every value is a per-row scalar
    expression (divisions/multiplications of exact ints), so IEEE-754
    doubles are bit-identical across engines — whereas round() itself
    diverges between engines at exact half-way points.
    """
    toks = tokens(text_col)
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(toks)
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^\w\s]"), 0))
    sw_ratio = stopword_ratio(text_col)
    avg_tok = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    ) / F.greatest(n_tokens, F.lit(1)).cast("double")
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1)).cast("double")
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + (1 - punct_ratio) * 0.3
        + F.least(sw_ratio * 5, F.lit(1.0)) * 0.3
    )
    return df.select(
        "doc_id",
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        avg_tok.alias("avg_token_len"),
        punct_ratio.alias("punct_ratio"),
        sw_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-stopword language ID: count marker hits per language, pick
    the argmax (ties broken by language code order, 'und' if no hits).
    A deliberately deterministic heuristic — at scale you'd swap in a
    fastText-style model as a Pandas UDF; the Spark plumbing (projection
    shape, no shuffle) is identical."""
    toks = tokens(text_col)
    scores = [
        F.size(F.filter(toks, lambda t: t.isin(list(markers)))).alias(f"score_{lang}")
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    scored = df.select("doc_id", F.col(text_col).alias("__t"), *scores)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.lit("und")
    # reverse order so earlier languages win ties (first match kept)
    for lg in reversed(langs):
        pred = F.when(
            (F.col(f"score_{lg}") == best) & (best > 0), F.lit(lg)
        ).otherwise(pred)
    return scored.select(
        "doc_id", *[F.col(f"score_{lg}") for lg in langs], pred.alias("predicted_lang")
    )


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercased text.
    Deterministic, engine-portable (DuckDB md5 produces the same hex)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.trim(F.lower(c)), r"\s+", " "))


def fingerprint_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.select("doc_id", fingerprint(text_col).alias("fp"))


# Redaction patterns for PII scrubbing (training-data hygiene). Order
# matters: longest/most-specific first so partial matches don't shadow.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\+?\d{1,3}[-. ])?(?:\(\d{3}\)|\d{3})[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b(?:\d[ -]?){13,16}\b", "<CARD>"),
)


def redact_pii(col: Column | str) -> Column:
    """Chain of regexp_replace passes — JVM-side, shuffle-free; the
    standard scrubbing stage before LLM training-data export."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-pattern match document counts (report shape stable)."""
    aggs = [
        F.sum(F.col(text_col).rlike(pat).cast("long")).alias(token)
        for pat, token in PII_PATTERNS
    ]
    wide = df.agg(*aggs)
    stack = "stack({n}, {args}) as (pii_type, n_docs)".format(
        n=len(PII_PATTERNS),
        args=", ".join(f"'{t}', `{t}`" for _, t in PII_PATTERNS),
    )
    return wide.selectExpr(stack)


def compression_ratio(col: Column | str, level: int = 6) -> Column:
    """zlib-compressed size of the UTF-8 text — the compression-ratio
    quality signal of Gopher/RefinedWeb-style curation (highly
    compressible text is repetitive boilerplate; incompressible text is
    noise/binary). Arrow-batched pandas UDF (Python is unavoidable: no
    JVM-side deflate expression exists), shuffle-free map over the scan;
    zlib output length at a fixed level is deterministic for a given
    input on every platform (RFC 1951 encoder in CPython's bundled zlib),
    but there is no SQL-expressible oracle — the query registers
    rows-only, with hand-case pytest pins."""
    import zlib

    from pyspark.sql.types import IntegerType

    @F.pandas_udf(IntegerType())
    def _csize(texts: pd.Series) -> pd.Series:
        return texts.fillna("").map(
            lambda t: len(zlib.compress(t.encode("utf-8"), level))
        )

    return _csize(F.col(col) if isinstance(col, str) else col)
