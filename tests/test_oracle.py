"""Driver-gate replica: every registered query with an oracle must match
DuckDB on row count, column names, and values (exact, after the explicit
rounding the queries themselves apply)."""

import pytest

from mysense_spark.oracle import check_query
from mysense_spark.queries import registry

NAMES = sorted(registry().keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    res = check_query(spark, name, sf_dir, float_tol=0.0)
    assert res.ok, f"{name}: {res.detail}"
