"""Hash-key generation — the reference's identity scheme.

Every hub/link/sat key in the reference is ``md5(a || b || ...)`` of
concatenated business-key parts (e.g. ``core/movie_hub.sql:13``,
``core/movie_emp_link.sql:22``, ``core/emp_movie_l_sat.sql:36``).
PostgreSQL ``||`` implicitly casts non-text operands to text and
propagates NULL: any NULL part nullifies the whole key, and the scripts
then drop those rows with ``md5(...) is not null``
(``core/movie_hub.sql:17``).

Spark parity notes:
- ``F.concat`` propagates NULL exactly like PG ``||``.  ``concat_ws``
  would silently *skip* nulls and corrupt keys — never use it here.
- int→string casts render identically ("142" both engines), so
  ``md5`` hex digests match PG/DuckDB byte-for-byte.

Scale note: md5 is computed JVM-side inside whole-stage codegen; keys
are uniformly distributed hex strings, so downstream joins/groupBys on
them shuffle without skew by construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def hash_key(*parts: ColumnOrName) -> Column:
    """``md5(p1 || p2 || ...)`` with PG `||` semantics (NULL-propagating).

    Mirrors the reference's key derivation (``core/movie_hub.sql:13``).
    """
    if not parts:
        raise ValueError("hash_key needs at least one column")
    return F.md5(F.concat(*[_col(p).cast("string") for p in parts]))


def null_safe_neq_any(left_prefix: str, right_prefix: str, attrs: list[str]) -> Column:
    """OR-of-differences predicate for SCD2 change detection.

    The reference builds ``l.attr != t.attr or ...`` dynamically
    (``ddl.py:532-534``) — null-naive, so value↔NULL transitions read
    as "unchanged".  We use null-safe ``<=>`` negated, the documented
    divergence (SURVEY.md §2.9): NULL→value and value→NULL *do* count
    as changes, NULL→NULL does not.
    """
    if not attrs:
        return F.lit(False)
    pred = None
    for a in attrs:
        neq = ~F.col(f"{left_prefix}.{a}").eqNullSafe(F.col(f"{right_prefix}.{a}"))
        pred = neq if pred is None else (pred | neq)
    return pred
