"""Text-analysis operators for training-data pipelines.

All four are pure built-in-function compositions (JVM-side, codegen'd,
zero Python in the hot path) so they scan-scale linearly: at 100 TB the
cost is one pass over the text column with no shuffle at all.

Parity discipline: every construct here has an exact DuckDB twin
(entry_queries.py) — splits use a literal ``' '`` separator, hashes are
md5, and ratios divide exact integer counts, so both engines produce
bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword sets for the n-gram/stopword heuristic.
# Order matters only for tie-breaking (lexicographic language code wins).
STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "es": ["el", "los", "las", "y", "es", "dos", "una", "en"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
}

# BPE-ish tokenizer: letter runs, digit runs, or single non-space symbols.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (literal single-space split — matches the
    oracle's ``string_split(x, ' ')``)."""
    return F.split(F.lower(text), " ")


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish regex token count (letter runs / digit runs / symbols)."""
    return F.regexp_count(text, F.lit(TOKEN_REGEX))


def stopword_hits(text: Column, lang: str) -> Column:
    """Occurrence count (not distinct) of ``lang``'s stopwords."""
    stops = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(stops, t)))


def language_id(text: Column) -> Column:
    """Heuristic language ID: argmax of stopword hit-rate across the
    known sets; ties broken by language code (deterministic); zero hits
    everywhere → ``'unknown'``."""
    best = None
    for lang in sorted(STOPWORDS):  # iterate in tie-break order
        hits = stopword_hits(text, lang)
        cand = F.struct(hits.alias("h"), F.lit(lang).alias("l"))
        best = cand if best is None else F.when(hits > best["h"], cand).otherwise(best)
    return F.when(best["h"] > 0, best["l"]).otherwise(F.lit("unknown"))


def quality_score(text: Column) -> Column:
    """Length/punctuation/stopword quality heuristic in [0, 1]:
    0.4·min(1, tokens/100) + 0.3·(1 − punct_ratio) + 0.3·min(1, 5·en_stopword_ratio),
    rounded to 6 dp.  Inputs are exact integer counts, so the float
    arithmetic is order-free and engine-portable."""
    n_tok = token_count_ws(text).cast("double")
    n_char = F.length(text).cast("double")
    n_clean = F.length(F.regexp_replace(text, r"[^A-Za-z0-9 ]", "")).cast("double")
    punct_ratio = F.when(n_char > 0, (n_char - n_clean) / n_char).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stopword_hits(text, "en").cast("double") / n_tok).otherwise(
        F.lit(0.0)
    )
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n_tok / F.lit(100.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * F.least(F.lit(1.0), F.lit(5.0) * stop_ratio)
    )
    return F.round(score, 6)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the casefolded,
    whitespace-collapsed text — the exact-dedup key."""
    normalized = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(normalized)


def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles (array<string>); fewer than ``n`` words →
    one shingle of the whole text.  Built with SQL ``transform`` over a
    ``sequence`` so it stays inside codegen."""
    words = tokens(text)
    return F.when(
        F.size(words) < n, F.array(F.array_join(words, " "))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        )
    )
