"""Text-analysis column functions for large-scale training-data pipelines.

All pure JVM-side expressions (``pyspark.sql.functions``) — each has an exact
ANSI-SQL twin so DuckDB can oracle-check results. Formulas are deliberately
written with portable primitives (length/replace/lower/md5) rather than
engine-specific tokenizers so both engines compute bit-identical answers.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# small multilingual stopword sets for the n-gram language heuristic
LANG_MARKERS = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " die ", " und ", " ist ", " das "],
    "fr": [" le ", " la ", " et ", " les ", " des "],
    "es": [" el ", " los ", " las ", " una ", " es "],
}

EN_STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"]


def token_count(col: Column) -> Column:
    """Whitespace-token count without split(): len - len(sans spaces) + 1 on
    the single-spaced text. Identical in Spark and DuckDB SQL."""
    squeezed = F.regexp_replace(F.trim(col), r"\s+", " ")
    return F.when(F.length(squeezed) == 0, F.lit(0)).otherwise(
        F.length(squeezed) - F.length(F.replace(squeezed, F.lit(" "), F.lit(""))) + 1
    )


def char_count(col: Column) -> Column:
    return F.length(col)


# GPT-2-style pretokenizer pattern, restricted to the lookahead-free subset
# both Spark (java.util.regex) and DuckDB (RE2) compile identically:
# contractions, space-prefixed letter runs, digit runs, punctuation runs.
BPE_TOKEN_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_count(col: Column) -> Column:
    """Subword-ish token count via the BPE pretokenizer regex — the cheap
    JVM-side proxy for LLM token budgeting (exact BPE needs the merges table;
    the pretokenizer split is the count that matters for budget estimates)."""
    return F.regexp_count(col, F.lit(BPE_TOKEN_PATTERN))


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are .,;:!? punctuation."""
    stripped = F.regexp_replace(col, r"[.,;:!?]", "")
    return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
        (F.length(col) - F.length(stripped)).cast("double") / F.length(col)
    )


def stopword_ratio(col: Column) -> Column:
    """Fraction of tokens that are common English stopwords (padded-substring
    count — portable across engines)."""
    padded = F.concat(
        F.lit(" "), F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "), F.lit(" ")
    )
    hits: Column = F.lit(0)
    for wrd in EN_STOPWORDS:
        token = f" {wrd} "
        # occurrences = (len - len(removed)) / len(token)
        hits = hits + (
            F.length(padded) - F.length(F.replace(padded, F.lit(token), F.lit("")))
        ) / len(token)
    return F.when(token_count(col) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / token_count(col)
    )


def quality_score(col: Column) -> Column:
    """Composite document-quality heuristic in [0, 1]: rewards moderate
    length, low punctuation noise, and natural stopword density."""
    toks = token_count(col).cast("double")
    length_term = F.least(toks / F.lit(100.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * 5.0, F.lit(1.0))
    stop_term = F.least(stopword_ratio(col) * 3.0, F.lit(1.0))
    return (length_term + punct_term + stop_term) / F.lit(3.0)


def lang_id(col: Column) -> Column:
    """Marker-token language heuristic: score each language by the count of
    its stopword markers in the padded lowercase text; pick the max
    (ties → lexicographically smallest language code, 'und' if no hits)."""
    padded = F.concat(
        F.lit(" "), F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "), F.lit(" ")
    )
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        s: Column = F.lit(0)
        for mk in markers:
            s = s + (
                F.length(padded) - F.length(F.replace(padded, F.lit(mk), F.lit("")))
            ) / len(mk)
        scores.append((lang, s))
    best_score = F.greatest(*[s for _, s in scores])
    result = F.lit("und")
    for lang, s in reversed(scores):  # reversed so earliest lang wins ties
        result = F.when((s == best_score) & (best_score > 0), F.lit(lang)).otherwise(result)
    return result


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the case/whitespace
    normalized text. Identical in DuckDB (md5 is standard)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def token_hash64(col: Column) -> Column:
    """Portable 60-bit integer hash of a token: first 15 hex chars of md5 as
    a bigint. Matches DuckDB: from_hex/conv equivalent expression."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
