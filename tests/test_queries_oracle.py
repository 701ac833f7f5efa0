"""Engine-vs-DuckDB oracle comparison at sf0.001 for every registered query
that declares an oracle — a fast local replica of the driver's gate."""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_SMALL
from us_dot_flights_lakehouse_spark import queries as registry
from us_dot_flights_lakehouse_spark.testing import assert_df_equal

# data-dependent oracles (literal-centroid IVF) must train on the sf
# this suite runs at
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_SMALL

QUERIES = registry.queries()
ORACLES = registry.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, sf_small, name):
    sdf = QUERIES[name](spark, sf_small)
    res = duck.execute(ORACLES[name])
    cols = [d[0] for d in res.description]
    assert_df_equal(sdf, res.fetchall(), cols)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_query_without_oracle_runs(spark, sf_small, name):
    df = QUERIES[name](spark, sf_small)
    assert df.count() >= 0
    assert df.columns
