"""Driver-sample prefix contract (verdict r8 task #6).

The external driver's correctness gate samples the FIRST 50
``queries()`` entries, so the prefix list is the round's most valuable
artifact and is maintained by hand across 18 domain modules.  These
tests pin the contract so an accidental reorder / oracle omission is
caught by the suite, not by a red driver row.
"""

from imdb_metacritic_data_warehouse_spark import entry_queries as eq

# The documented round-9 prefix head: every query that had never
# appeared in a driver sample through round 8 (union of the
# CORRECTNESS_r01..r08 green rows = 334 of 352 names; these are the
# other 18).  New wave-35+ queries are appended after this block and
# before the rotation tail.
R9_NEVER_SAMPLED_HEAD = [
    "approx_sketches",
    "multimodal_features",
    "frequent_triples_parts",
    "substring_dup_spans_docs",
    "prd_divergence_embeddings",
    "tokenizer_fertility_drift",
    "kcenter_coreset_embeddings",
    "domain_reweight_step_docs",
    "retraction_ivm_orders",
    "horvitz_thompson_docs",
    "bh_fdr_sources",
    "mann_kendall_daily",
    "char_entropy_docs",
    "length_bucketing_audit_docs",
    "brier_decomposition_docs",
    "acf_ljungbox_daily",
    "mcnemar_rules_docs",
    "ab_power_sample_size_events",
]


def test_prefix_is_exactly_50_and_leads_queries():
    assert len(eq._PRIORITY_PREFIX) == 50
    assert list(eq.QUERIES)[:50] == eq._PRIORITY_PREFIX


def test_prefix_head_covers_every_never_sampled_query():
    # the whole point of the r9 rotation: all 18 never-driver-sampled
    # names must sit inside the sampled window.
    head = set(eq._PRIORITY_PREFIX)
    missing = [n for n in R9_NEVER_SAMPLED_HEAD if n not in head]
    assert not missing, missing
    # and they lead the list (positions 0..17) so a driver that samples
    # fewer rows than promised still covers the riskiest names first.
    assert eq._PRIORITY_PREFIX[: len(R9_NEVER_SAMPLED_HEAD)] == R9_NEVER_SAMPLED_HEAD


def test_every_prefix_name_has_an_oracle():
    # a prefix name without oracle SQL downgrades the driver row to the
    # weaker rows-only check — never intentional for sampled queries.
    missing = [n for n in eq._PRIORITY_PREFIX if n not in eq.ORACLES]
    assert not missing, missing


def test_prefix_names_are_unique_and_registered():
    assert len(set(eq._PRIORITY_PREFIX)) == 50
    unknown = [n for n in eq._PRIORITY_PREFIX if n not in eq.QUERIES]
    assert not unknown, unknown
