"""Driver-sample prefix contract (verdict r8 task #6, generalized in
round 10 per verdict r9 task #1).

The external driver's correctness gate samples the FIRST 50
``queries()`` entries, so the prefix is the round's most valuable
artifact.  Instead of pinning a hand-maintained name list, these tests
RECOMPUTE the rotation policy (tools/prefix_policy.py): every query
whose reachable code changed since its last green driver sample must
sit inside the sampled window, most recently changed first.  Editing a
package module without refreshing the prefix fails the suite —
regenerate with ``python tools/prefix_policy.py --emit``.
"""

import os
import subprocess
import sys

import pytest

from imdb_metacritic_data_warehouse_spark import entry_queries as eq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _git_available() -> bool:
    try:
        subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=REPO,
            capture_output=True,
            check=True,
        )
        return True
    except Exception:
        return False


def test_prefix_is_exactly_50_and_leads_queries():
    assert len(eq._PRIORITY_PREFIX) == 50
    assert list(eq.QUERIES)[:50] == eq._PRIORITY_PREFIX


def test_every_prefix_name_has_an_oracle():
    # a prefix name without oracle SQL downgrades the driver row to the
    # weaker rows-only check — never intentional for sampled queries.
    missing = [n for n in eq._PRIORITY_PREFIX if n not in eq.ORACLES]
    assert not missing, missing


def test_prefix_names_are_unique_and_registered():
    assert len(set(eq._PRIORITY_PREFIX)) == 50
    unknown = [n for n in eq._PRIORITY_PREFIX if n not in eq.QUERIES]
    assert not unknown, unknown


@pytest.mark.skipif(not _git_available(), reason="needs the git history")
def test_prefix_head_matches_computed_rotation_policy():
    """The rule itself (verdict r9 task #1): names whose reachable code
    changed since their last green driver sample lead the prefix —
    recomputed here from the git history + CORRECTNESS_r*.json, not
    hand-pinned.  Order within the required head is free (the emit
    order is one valid serialization); membership and position ahead
    of any pure-rotation filler are not."""
    import prefix_policy as pp

    def head_mismatch():
        required = pp.required_head(cap=50)
        assert required, "policy computed an empty head — tool regression?"
        head = eq._PRIORITY_PREFIX[: len(required)]
        return (
            sorted(set(required) - set(head)),
            sorted(set(head) - set(required)),
        )

    pp.set_view(False)
    missing, extra = head_mismatch()
    if missing or extra:
        # A checkout taken right after a round's record commit carries
        # CORRECTNESS_r{N} the frozen prefix could not have known
        # about; the pre-boundary view must then match instead (the
        # next session's first task is the rotation).
        pp.set_view(True)
        try:
            missing, extra = head_mismatch()
        finally:
            pp.set_view(False)
    assert not missing and not extra, (
        "prefix head is out of sync with tools/prefix_policy.py — "
        "regenerate with `python tools/prefix_policy.py --emit`.\n"
        f"missing from head: {missing}\nunexpected in head: {extra}"
    )


@pytest.mark.skipif(not _git_available(), reason="needs the git history")
def test_policy_flags_verdict_named_r9_changes():
    """Regression pin for the policy engine: the round-9 diff touched
    the pagerank/ppr fusion (operators/graph.py), global_prefix
    (operators/rank.py) and the fuzzy_match collapse-exact rewrite
    (q03_dedup_lsh.py:1845 — the hunk header says
    quality_calibrated_filter but the changed builder is
    fuzzy_match_part_names); the policy must flag all of them as
    changed after their last green sample."""
    import prefix_policy as pp

    pp.set_view(False)
    changed = pp.changed_since_last_sample()
    sampled = pp.last_green_sample()
    for name in (
        "pagerank_parts_copurchase",
        "ppr_parts_seeded",
        "fuzzy_match_part_names",
        "wasserstein_drift_orders",
    ):
        # a round-10+ green sample supersedes the pin (the driver has
        # since re-validated the changed code)
        ok = changed.get(name, 0) >= 9 or sampled.get(name, -1) >= 10
        assert ok, (name, changed.get(name), sampled.get(name))
