from .keys import hash_key, null_safe_neq_any
from .parsing import (
    explode_genres_json,
    explode_genres_split,
    parse_digits_to_long,
    parse_duration_minutes,
    parse_year,
    strip_parens,
)

__all__ = [
    "hash_key",
    "null_safe_neq_any",
    "explode_genres_json",
    "explode_genres_split",
    "parse_digits_to_long",
    "parse_duration_minutes",
    "parse_year",
    "strip_parens",
]
