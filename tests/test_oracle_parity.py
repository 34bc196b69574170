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
    orphans = sorted(set(ORACLES) - set(QUERIES))
    assert not orphans, f"oracle entries without a query fn: {orphans}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    if name not in ORACLES:
        pytest.skip("no oracle (rows-only check)")
    df = QUERIES[name](spark, SF_TEST)
    assert_match(df, duck, ORACLES[name], name)
