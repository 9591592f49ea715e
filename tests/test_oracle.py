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


def test_compare_frames_rejects_decimal_vs_float():
    """The r3/r4 station_calibration escape: Spark DecimalType lands in
    pandas as object(Decimal) and the old compare coerced it to float64
    before comparing — bit-identical values, different column type, local
    green, driver red. compare_frames must fail the dtype class itself."""
    from decimal import Decimal

    import pandas as pd

    from mysense_spark.oracle import compare_frames

    oracle = pd.DataFrame({"k": [1, 2], "v": [1.5, 2.5]})
    drifted = pd.DataFrame({"k": [1, 2], "v": [Decimal("1.5"), Decimal("2.5")]})
    res = compare_frames(drifted, oracle)
    assert not res.ok and "dtype class differs" in res.detail

    # and the all-float twin still passes (the fix must not over-reject)
    same = pd.DataFrame({"k": [1, 2], "v": [1.5, 2.5]})
    assert compare_frames(same, oracle).ok
