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
    """Round-6 tier contract (VERDICT r5 item 1): the 50-slot tier ends
    with the two documented rows-only entries (their weaker rows-only
    driver rows close the ledger in one rotation); every other tier slot
    is oracle-backed so the driver's hash compare does real work."""
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    first50 = list(qs)[:50]
    assert len(first50) == 50
    assert set(first50[-len(ROWS_ONLY):]) == ROWS_ONLY
    assert all(name in os_ for name in first50[: -len(ROWS_ONLY)])


def test_everything_past_the_tier_is_oracle_backed():
    """With both rows-only entries spent inside the tier, the dict tail
    must be 100% oracle-backed — a new rows-only query can only appear
    by being added to the documented ROWS_ONLY set."""
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    rest = list(qs)[50:]
    assert all(name in os_ for name in rest), [
        n for n in rest if n not in os_
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
