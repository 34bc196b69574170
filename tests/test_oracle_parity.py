"""Every registered query must match its DuckDB oracle (the driver's t2
gate, run locally at sf0.001 for speed; the driver uses sf0.01)."""

import pytest

from spark_binlog_spark import registry
from tests.conftest import SF_TEST
from tests.oracle_util import assert_match

QUERIES = registry.queries()
ORACLES = registry.oracle_sql()


def test_every_query_has_an_oracle():
    missing = sorted(set(QUERIES) - set(ORACLES))
    # streaming-only queries are allowed to omit the oracle; none yet
    assert not missing, f"queries without oracle SQL: {missing}"


def test_no_orphan_oracles():
    # check the raw ORACLE pools, not oracle_sql()'s output (which now
    # fail-fasts on orphans itself — see next test)
    from spark_binlog_spark import queries_cdc, queries_ext

    pool = {**queries_cdc.ORACLE, **queries_ext.ORACLE}
    orphans = sorted(set(pool) - set(QUERIES))
    assert not orphans, f"oracle entries without a query fn: {orphans}"


def test_queries_raises_on_unranked(monkeypatch):
    # a new q_ function left out of PRIORITY/TAIL must fail loudly, not
    # be silently appended after the tail (VERDICT r4 "What's wrong" #4)
    from spark_binlog_spark import queries_ext

    monkeypatch.setattr(
        queries_ext, "q_brand_new_unranked", lambda spark, sf: None, raising=False
    )
    with pytest.raises(KeyError, match="q_brand_new_unranked"):
        registry.queries()


def test_priority_is_exactly_the_graded_prefix():
    # the driver grades a 50-query prefix; PRIORITY must be exactly 50
    # and emitted first, else the rotation plan silently drifts
    assert len(registry.PRIORITY) == 50
    assert list(QUERIES)[:50] == registry.PRIORITY


def test_oracle_sql_raises_on_orphan(monkeypatch):
    # an oracle left behind by a query rename must fail loudly, not be
    # silently dropped from the driver's correctness sweep
    from spark_binlog_spark import queries_ext

    monkeypatch.setitem(queries_ext.ORACLE, "q_renamed_away", "SELECT 1")
    with pytest.raises(KeyError, match="q_renamed_away"):
        registry.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    if name not in ORACLES:
        pytest.skip("no oracle (rows-only check)")
    df = QUERIES[name](spark, SF_TEST)
    assert_match(df, duck, ORACLES[name], name)
