"""The entry_queries package split (verdict r7 task #5) — aggregation
invariants that must survive any future module re-organization.

The one-shot split was verified against a byte-level snapshot of the
flat module (same key ORDER, same oracle SQL, same function sources
modulo the `from .` -> `from ..` depth rewrite — tools/
split_entry_queries.py docstring).  These are the standing invariants.
"""

from imdb_metacritic_data_warehouse_spark import entry_queries as eq
from imdb_metacritic_data_warehouse_spark.entry_queries import _registry


def test_registry_shape():
    assert len(eq.QUERIES) == 371
    # FULL oracle coverage: every registered query has a DuckDB twin
    # (ann_ivf's contract-banded oracle included)
    assert set(eq.ORACLES) == set(eq.QUERIES)
    # the reordered public dicts cover exactly the raw registrations
    assert set(eq.QUERIES) == set(_registry.QUERIES)
    assert set(eq.ORACLES) == set(_registry.ORACLES)


def test_priority_prefix_leads():
    assert len(eq._PRIORITY_PREFIX) == 50
    assert list(eq.QUERIES)[: len(eq._PRIORITY_PREFIX)] == eq._PRIORITY_PREFIX


def test_query_functions_reexported():
    # external sites do `from ...entry_queries import <fn>` — every
    # registered callable must be importable from the package root.
    for name, fn in eq.QUERIES.items():
        assert getattr(eq, fn.__name__) is fn, name


def test_domain_modules_register_in_order():
    # registration order must follow the qNN module order: a query
    # defined in q03 can never precede one from q01 in the RAW dict.
    import inspect

    mods = [inspect.getmodule(fn).__name__ for fn in _registry.QUERIES.values()]
    seq = [m.rsplit(".", 1)[1] for m in mods if ".entry_queries.q" in m]
    # ADVICE r8: the old asserts only enforced per-module contiguity
    # (any block arrangement passed).  Exact invariant: the sequence of
    # FIRST occurrences must equal the lexicographically sorted module
    # list — q01 registers before q02 before q03 ...
    firsts = list(dict.fromkeys(seq))
    assert firsts == sorted(firsts), firsts
    # and each module's registrations are contiguous (no interleaving)
    assert seq == sorted(seq, key=lambda s: firsts.index(s))
