"""The driver gate, replicated locally: every queries() entry must match
its oracle_sql() on the fixture tables (sf0.001 by default for speed;
set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full t2 run).
"""

import pytest

import __spark_entry__ as entry_mod
from tests.oracle import compare

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0


def test_every_query_has_callable_signature():
    assert QUERIES, "queries() must not be empty"
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_bench_display_set_is_stable_and_valid():
    """The bench stdout line prints a FROZEN query-name set (round-12
    fix for the phantom dropped/new churn): every display name must be
    a live contract query, with no duplicates, and the round-11 names
    must all still be present (append-only contract)."""
    import bench

    names = bench.DISPLAY_QUERIES
    assert len(names) == len(set(names)), "duplicate display names"
    missing = [n for n in names if n not in QUERIES]
    assert not missing, f"display names not in the contract: {missing}"
    assert len(names) >= 65, "round-11 display names may not be removed"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    if name not in ORACLES:
        df = QUERIES[name](spark, sf_dir)
        assert df.count() >= 0  # rows-only check, like the driver
        return
    df = QUERIES[name](spark, sf_dir)
    report = compare(df, ORACLES[name], sf_dir)
    assert report["ok"], f"{name}: {report['issues']}"
    # bit-exactness watchdog: warn-level info surfaced in failure message
    assert report["max_float_diff"] == 0.0, (
        f"{name}: values only float-tolerance equal (max diff "
        f"{report['max_float_diff']}) — driver hash may mismatch"
    )
