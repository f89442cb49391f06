"""Pins the __spark_entry__ driver contract — the round-4 incident was
a contract breach (queries() grew past the driver's 50-entry
correctness cap and the LAST five entries, the flagship configs,
silently fell out of the gate), so the contract is now a test."""

import __spark_entry__ as entry_mod


def test_queries_fit_under_driver_cap_flagship_first():
    from dragnet_spark.flagship_oracle import FLAGSHIP_QUERIES
    qs = entry_mod.queries()
    names = list(qs)
    # the driver checks at most the FIRST 50 entries
    assert len(names) <= 50, f"{len(names)} entries would exceed the cap"
    # the reference's core can never fall off the end again
    assert names[:len(FLAGSHIP_QUERIES)] == list(FLAGSHIP_QUERIES)
    assert all(callable(fn) for fn in qs.values())


def test_oracles_cover_every_query():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    # no orphan oracle (a key the driver would never run)
    assert set(oracles) <= set(qs), set(oracles) - set(qs)
    # every query is SQL-checked (no rows-only weak checks left)
    assert set(qs) == set(oracles), set(qs) - set(oracles)
    assert all(isinstance(s, str) and s.strip() for s in oracles.values())


def test_entry_returns_stable_nonempty_relation(spark):
    df = entry_mod.entry(spark)
    assert df.columns  # stable schema
    assert df.count() > 0
