"""Driver-contract registry invariants — cheap guards against the
regressions that cost driver-attestation slots: a query losing its
oracle silently, a rows-only entry drifting into the 50-slot priority
tier, or an oracle keyed to a query that no longer exists."""

import __spark_entry__ as entrymod

# the ONLY queries allowed to lack an exact DuckDB oracle, each for a
# documented reason (BASELINE.md round-4 ledger)
ROWS_ONLY = {
    "mwu_full_pipeline",   # unrounded reference-parity table; rounded
                           # twin mwu_full_rounded is oracle-exact
    "text_cardinality",    # HLL sketch values are engine-specific
}


def test_every_oracle_has_a_query():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs), sorted(set(os_) - set(qs))


def test_rows_only_set_is_exactly_the_documented_two():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(qs) - set(os_) == ROWS_ONLY


def test_priority_tier_is_50_entries_rows_only_last():
    """Tier contract, rotation-agnostic form (the r6 one-time
    ledger-closing shape pinned the rows-only pair at tier end; from the
    r8 freshness rotation on, the tier re-attests the STALEST queries,
    which the rows-only pair — attested r7 — need not be): exactly 50
    entries; every slot is either oracle-backed (the driver's hash
    compare does real work) or one of the documented ROWS_ONLY pair; and
    any ROWS_ONLY entries that ARE in the tier sit at its end so they
    never displace an oracle-backed slot ordering decision."""
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    first50 = list(qs)[:50]
    assert len(first50) == 50
    in_tier_rows_only = [n for n in first50 if n in ROWS_ONLY]
    assert all(
        name in os_ or name in ROWS_ONLY for name in first50
    ), [n for n in first50 if n not in os_ and n not in ROWS_ONLY]
    if in_tier_rows_only:
        assert first50[-len(in_tier_rows_only):] == in_tier_rows_only


def test_everything_past_the_tier_is_oracle_backed():
    """The dict tail must be oracle-backed except for the documented
    ROWS_ONLY pair — a NEW rows-only query can only appear by being
    added to the documented set (which the exact-set test above pins)."""
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    rest = list(qs)[50:]
    assert all(name in os_ or name in ROWS_ONLY for name in rest), [
        n for n in rest if n not in os_ and n not in ROWS_ONLY
    ]


def test_smoke_tier_names_are_registered_and_oracle_backed():
    """The --smoke iteration gate (tools/check_oracle.py, VERDICT r6
    item 5) must not rot: every SMOKE name stays a registered,
    oracle-backed query (a rename that misses the smoke list would
    silently shrink the gate — check_oracle filters by set membership,
    so an unknown name is skipped, not failed)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "check_oracle",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "check_oracle.py"),
    )
    co = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(co)
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(co.SMOKE) <= set(qs), sorted(set(co.SMOKE) - set(qs))
    assert set(co.SMOKE) <= set(os_), sorted(set(co.SMOKE) - set(os_))
    assert len(co.SMOKE) == len(set(co.SMOKE))


def test_oracle_sql_is_nonempty_select():
    for name, sql in entrymod.oracle_sql().items():
        s = sql.strip().upper()
        assert s.startswith(("SELECT", "WITH")), name
