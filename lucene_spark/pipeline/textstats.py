"""Text analysis for training-data curation: token counts, quality
scores, language ID, document fingerprints.

All operators are pure built-in `pyspark.sql.functions` column
expressions (JVM-side, whole-stage-codegen) — no Python in the hot path
at all. Each has an exact DuckDB-SQL oracle (same regexes, same
arithmetic), registered in `__spark_entry__.py`.

At 100 TB these are embarrassingly parallel per-row projections: no
shuffle, filters/projections push down to the Parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Word tokens (same class as the index analyzer, analysis.py TOKEN_REGEX).
WORD_RE = "[0-9a-z_]+"
# BPE-ish pre-tokenizer: letter runs | digit runs | single non-alnum,
# the GPT-2-style pre-split shape (letters/digits/punct separated).
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
# Marker stopwords per language for the n-gram/marker heuristic language ID.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "for", "with", "this", "that"],
    "es": ["el", "la", "los", "las", "que", "por"],
    "fr": ["le", "les", "des", "une", "est", "dans"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
}
STOPWORDS_EN = ["the", "a", "and", "or", "of", "to", "in", "is", "for", "with"]


def _count_re(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace, word-regex, and BPE-ish token counts per document."""
    lowered = F.lower(F.col(text_col))
    ws = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(F.col(text_col)), "\\s+")))
    return df.select(
        "doc_id",
        ws.cast("int").alias("ws_tokens"),
        _count_re(lowered, WORD_RE).alias("word_tokens"),
        _count_re(lowered, BPE_RE).alias("bpe_tokens"),
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality metrics: length, mean token length, stopword
    ratio, alpha ratio, and a composite score in [0, 1].

    score = 0.25*(len in [50,5000]) + 0.25*(5 <= mean_tok_len <= 12 ... )
    kept as simple bounded ratios so the oracle is exact arithmetic.
    """
    lowered = F.lower(F.col(text_col))
    n_chars = F.length(F.col(text_col))
    n_words = _count_re(lowered, WORD_RE)
    word_chars = F.length(F.regexp_replace(lowered, "[^0-9a-z_]+", ""))
    stop_alt = "|".join(STOPWORDS_EN)
    n_stop = _count_re(lowered, f"\\b({stop_alt})\\b")
    mean_len = F.when(n_words > 0, word_chars / n_words).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, word_chars / n_chars).otherwise(F.lit(0.0))
    score = (
        0.25 * F.when((n_chars >= 50) & (n_chars <= 5000), 1.0).otherwise(0.0)
        + 0.25 * F.when((mean_len >= 2.0) & (mean_len <= 12.0), 1.0).otherwise(0.0)
        + 0.25 * F.least(stop_ratio * 4.0, F.lit(1.0))
        + 0.25 * alpha_ratio
    )
    return df.select(
        "doc_id",
        n_chars.cast("int").alias("n_chars_m"),
        n_words.cast("int").alias("n_words"),
        F.round(mean_len, 4).alias("mean_tok_len"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(score, 4).alias("quality"),
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: per language, count marker-word hits;
    predict the argmax (ties broken by language code asc; 'und' if no
    hits). A character-n-gram profile would be the production upgrade;
    the marker heuristic keeps the oracle exact."""
    lowered = F.lower(F.col(text_col))
    cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        alt = "|".join(markers)
        cols.append(_count_re(lowered, f"\\b({alt})\\b").alias(f"hits_{lang}"))
    out = df.select("doc_id", *cols)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.when(best == 0, F.lit("und"))
    for lg in langs:  # first (asc) language reaching the max wins
        pred = pred.when(F.col(f"hits_{lg}") == best, F.lit(lg))
    return out.select(
        "doc_id", *[F.col(f"hits_{lg}") for lg in langs], pred.alias("pred_lang")
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 over the normalized token
    stream (lowercased word tokens joined by one space). Identical token
    streams => identical fingerprints regardless of whitespace/punct —
    the normalization step of fuzzy dedup pipelines."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), F.lit(0))
    return df.select(
        "doc_id",
        F.md5(F.concat_ws(" ", toks)).alias("fingerprint"),
    )


# --- DuckDB oracle SQL (same regexes/arithmetic, dialect: DuckDB) -----------


def token_counts_sql() -> str:
    return f"""
SELECT doc_id,
       CASE WHEN len(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END::INT AS ws_tokens,
       len(regexp_extract_all(lower(text), '{WORD_RE}'))::INT AS word_tokens,
       len(regexp_extract_all(lower(text), '{BPE_RE}'))::INT AS bpe_tokens
FROM documents ORDER BY doc_id"""


def quality_sql() -> str:
    stop_alt = "|".join(STOPWORDS_EN)
    return f"""
WITH m AS (
  SELECT doc_id,
         length(text) AS n_chars_m,
         len(regexp_extract_all(lower(text), '{WORD_RE}')) AS n_words,
         length(regexp_replace(lower(text), '[^0-9a-z_]+', '', 'g')) AS word_chars,
         len(regexp_extract_all(lower(text), '\\b({stop_alt})\\b')) AS n_stop
  FROM documents)
SELECT doc_id, n_chars_m::INT AS n_chars_m, n_words::INT AS n_words,
       round(CASE WHEN n_words > 0 THEN word_chars / CAST(n_words AS DOUBLE) ELSE 0.0 END, 4) AS mean_tok_len,
       round(CASE WHEN n_words > 0 THEN n_stop / CAST(n_words AS DOUBLE) ELSE 0.0 END, 4) AS stop_ratio,
       round(CASE WHEN n_chars_m > 0 THEN word_chars / CAST(n_chars_m AS DOUBLE) ELSE 0.0 END, 4) AS alpha_ratio,
       round(0.25 * (CASE WHEN n_chars_m BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.0 END)
           + 0.25 * (CASE WHEN n_words > 0 AND word_chars / CAST(n_words AS DOUBLE) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)
           + 0.25 * least((CASE WHEN n_words > 0 THEN n_stop / CAST(n_words AS DOUBLE) ELSE 0.0 END) * 4.0, 1.0)
           + 0.25 * (CASE WHEN n_chars_m > 0 THEN word_chars / CAST(n_chars_m AS DOUBLE) ELSE 0.0 END), 4) AS quality
FROM m ORDER BY doc_id"""


def lang_id_sql() -> str:
    langs = sorted(LANG_MARKERS)
    hit_cols = ",\n         ".join(
        "len(regexp_extract_all(lower(text), '\\b({})\\b')) AS hits_{}".format(
            "|".join(LANG_MARKERS[lg]), lg
        )
        for lg in langs
    )
    best = f"greatest({', '.join(f'hits_{lg}' for lg in langs)})"
    case = "CASE WHEN {b} = 0 THEN 'und' {whens} END".format(
        b=best,
        whens=" ".join(f"WHEN hits_{lg} = {best} THEN '{lg}'" for lg in langs),
    )
    sel = ", ".join(f"hits_{lg}::INT AS hits_{lg}" for lg in langs)
    return f"""
WITH h AS (
  SELECT doc_id,
         {hit_cols}
  FROM documents)
SELECT doc_id, {sel}, {case} AS pred_lang FROM h ORDER BY doc_id"""


def fingerprint_sql() -> str:
    return f"""
SELECT doc_id,
       md5(array_to_string(regexp_extract_all(lower(text), '{WORD_RE}'), ' ')) AS fingerprint
FROM documents ORDER BY doc_id"""


# --- scrubbing: URL / email / IP / long-hex-secret redaction ---------------
# Pure JVM regexp_replace chain; the DuckDB oracle applies the identical
# regexes, so cleaned text is compared by md5. RE2/Java dialect overlap
# only (no lookbehind).

SCRUB_PATTERNS: list[tuple[str, str, str]] = [
    # (name, pattern, replacement)
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("hexsecret", r"\b[0-9a-fA-F]{32,}\b", "<SECRET>"),
]


def with_scrubbed(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_url, n_email, n_ipv4, n_hexsecret, clean_md5): redact
    PII-ish spans and report per-kind match counts plus the md5 of the
    cleaned text. Patterns apply IN ORDER (a URL containing an email is
    redacted as a URL first) — the oracle applies the same order."""
    cleaned = F.col(text_col)
    counts = []
    for name, pat, repl in SCRUB_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(cleaned, F.lit(pat), F.lit(0))).alias(f"n_{name}")
        )
        cleaned = F.regexp_replace(cleaned, pat, repl)
    return df.select("doc_id", *counts, F.md5(cleaned).alias("clean_md5"))


def scrubbed_sql() -> str:
    cleaned = "text"
    selects = []
    for name, pat, repl in SCRUB_PATTERNS:
        pat_sql = pat.replace("'", "''")
        selects.append(
            f"len(regexp_extract_all({cleaned}, '{pat_sql}'))::INT AS n_{name}"
        )
        cleaned = f"regexp_replace({cleaned}, '{pat_sql}', '{repl}', 'g')"
    cols = ", ".join(selects)
    return f"""
SELECT doc_id, {cols}, md5({cleaned}) AS clean_md5
FROM documents ORDER BY doc_id"""
