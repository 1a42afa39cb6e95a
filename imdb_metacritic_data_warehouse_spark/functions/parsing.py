"""Scalar parsing helpers (reference F3–F16, SURVEY.md §2.8).

All are built-in-function compositions — JVM-side, codegen'd, no Python
UDFs — so they stay inside whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def explode_genres_split(genres: Column) -> Column:
    """Genre-list parse, variant 1 (``core/genre_hub.sql:4-9``).

    The raw ``genres`` column is a stringified Python list
    (``"['Action', 'Drama']"``, written by ``imdb parser.py:244-247``).
    Variant 1 = bracket-strip → split on ``', '`` → per-element quote
    strip.  Returns an array column; callers ``F.explode`` it.
    """
    stripped = F.regexp_replace(genres, r"[\[\]]", "")
    arr = F.split(stripped, ", ")
    return F.filter(
        F.transform(arr, lambda g: F.replace(g, F.lit("'"), F.lit(""))),
        lambda g: g != F.lit(""),
    )


def explode_genres_json(genres: Column) -> Column:
    """Genre-list parse, variant 2 (``core/movie_genre_link.sql:5``).

    Variant 2 = single→double quote replace → JSON parse →
    ``json_array_elements_text``.  Spark: ``from_json`` to
    ``array<string>``.  Must agree with variant 1 on every input the
    scraper can emit (unit-tested equivalence, SURVEY.md §7.5).
    """
    jsonish = F.regexp_replace(genres, "'", '"')
    return F.from_json(jsonish, T.ArrayType(T.StringType()))


def parse_digits_to_long(s: Column) -> Column:
    """Digit-extraction parse for budget/gross (``imdb parser.py:85,91``):
    keep digits only, cast to long; empty/garbage → NULL (Spark non-ANSI
    cast, the documented divergence for ``''::bigint``)."""
    digits = F.regexp_replace(s, "[^0-9]", "")
    return F.when(digits == "", F.lit(None).cast("long")).otherwise(digits.cast("long"))


def parse_duration_minutes(s: Column) -> Column:
    """Duration text → minutes (``imdb parser.py:102-118``,
    ``metacritic parser.py:103-114``).  Handles the three shapes the
    scrapers see: ``'2 hours 10 minutes'``, ``'2 hours'``, ``'45
    minutes'`` (and ``h``/``m`` abbreviations)."""
    hours = F.regexp_extract(s, r"(\d+)\s*h", 1)
    mins = F.regexp_extract(s, r"(\d+)\s*m", 1)
    hours_n = F.when(hours == "", F.lit(0)).otherwise(hours.cast("int"))
    mins_n = F.when(mins == "", F.lit(0)).otherwise(mins.cast("int"))
    total = hours_n * 60 + mins_n
    return F.when(s.isNull() | ((hours == "") & (mins == "")), F.lit(None).cast("int")).otherwise(
        total
    )


def parse_year(s: Column) -> Column:
    """First 4-digit token (``imdb parser.py:49-55``)."""
    y = F.regexp_extract(s, r"(\d{4})", 1)
    return F.when(y == "", F.lit(None).cast("int")).otherwise(y.cast("int"))


def strip_parens(s: Column) -> Column:
    """``replace(replace(x,')',''),'(','')`` from
    ``mart/employee_data.sql:6``."""
    return F.replace(F.replace(s, F.lit(")"), F.lit("")), F.lit("("), F.lit(""))


def url_host(url: Column) -> Column:
    """Host component of an http(s) URL (empty string if malformed).
    Plain regexp — codegen'd JVM-side, symmetric with the DuckDB
    oracle's ``regexp_extract`` (Spark's ``parse_url`` has no DuckDB
    twin, so the web-corpus ops standardize on the regexp form)."""
    return F.regexp_extract(url, r"^https?://([^/?#]+)", 1)


def url_path(url: Column) -> Column:
    """Path component (query string and fragment stripped)."""
    return F.regexp_extract(url, r"^https?://[^/?#]+([^?#]*)", 1)


def canonical_url(url: Column) -> Column:
    """Canonical form for URL-level dedup: host with the mobile/www
    subdomain stripped, plus the path with tracking params and
    fragment dropped — the normalization pass a web-corpus dedup runs
    before counting a page twice (CCNet/RefinedWeb-style)."""
    host = F.regexp_replace(url_host(url), r"^(www|m)\.", "")
    return F.concat(host, url_path(url))


def registrable_domain(url: Column) -> Column:
    """Registrable domain (eTLD+1 under a single-label public-suffix
    assumption — the last two dot-labels of the host).  A real
    deployment swaps in the public-suffix list; the extraction,
    grouping and blocklist plumbing around it are unchanged."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)
