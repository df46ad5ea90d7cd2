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


def test_priority_tier_is_50_oracle_backed_entries():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    first50 = list(qs)[:50]
    assert len(first50) == 50
    assert all(name in os_ for name in first50)


def test_rows_only_entries_ordered_last():
    names = list(entrymod.queries())
    assert set(names[-len(ROWS_ONLY):]) == ROWS_ONLY


def test_oracle_sql_is_nonempty_select():
    for name, sql in entrymod.oracle_sql().items():
        s = sql.strip().upper()
        assert s.startswith(("SELECT", "WITH")), name
