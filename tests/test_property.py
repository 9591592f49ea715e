"""Property-based tests (hypothesis) for the pure-python operator
kernels — invariants that hold for ANY input, complementing the golden
vectors in test_operators_unit."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mysense_spark.operators._tdist import t_cdf, t_ppf
from mysense_spark.operators.geo import geohash_decode, geohash_encode
from mysense_spark.operators.qc import grubbs_filter

finite_lat = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)
finite_lon = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False)


@given(lat=finite_lat, lon=finite_lon)
@settings(max_examples=300, deadline=None)
def test_geohash_roundtrip_anywhere(lat, lon):
    """12-char geohash cells are ~±1.7e-5 deg; decode must land inside."""
    gh = geohash_encode(lat, lon, 12)
    assert len(gh) == 12
    dlat, dlon = geohash_decode(gh)
    assert abs(dlat - lat) < 1e-4
    assert abs(dlon - lon) < 1e-4


@given(lat=finite_lat, lon=finite_lon, p=st.integers(min_value=1, max_value=12))
@settings(max_examples=200, deadline=None)
def test_geohash_prefix_nesting(lat, lon, p):
    """A shorter geohash is a prefix of the longer one for the same
    point — the property neighbour-search bucketing relies on."""
    assert geohash_encode(lat, lon, 12).startswith(geohash_encode(lat, lon, p))


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
        min_size=15,
        max_size=80,
    )
)
@settings(max_examples=200, deadline=None)
def test_grubbs_invariants(vals):
    """For any series: the keep-mask keeps an envelope-interior subset
    (outliers are only ever shaved from the extremes), at least 2 values
    survive, and the filter is idempotent (a second pass removes
    nothing)."""
    arr = np.asarray(vals, dtype=np.float64)
    mask = grubbs_filter(arr)
    assert mask.dtype == bool and mask.shape == arr.shape
    kept = arr[mask]
    assert kept.size >= 2
    # removed values are extreme relative to the survivors' envelope:
    # nothing strictly inside (min(kept), max(kept)) may be removed
    removed = arr[~mask]
    assert not np.any((removed > kept.min()) & (removed < kept.max()))
    mask2 = grubbs_filter(kept)
    assert mask2.all()


@given(
    q=st.floats(min_value=0.55, max_value=0.999),
    df=st.integers(min_value=1, max_value=200),
)
@settings(max_examples=200, deadline=None)
def test_tdist_roundtrip_and_monotonic(q, df):
    x = t_ppf(q, df)
    assert x > 0
    assert abs(t_cdf(x, df) - q) < 1e-6
    # heavier tails at lower df: quantiles shrink toward normal as df grows
    assert t_ppf(q, df) >= t_ppf(q, df + 50) - 1e-9


@given(
    vals=st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=3, max_size=50)
)
@settings(max_examples=150, deadline=None)
def test_grubbs_constant_and_order(vals):
    """A constant series has no outliers; and the mask is a function of
    values-by-position, invariant to evaluation order details (same
    input -> same mask on repeat calls)."""
    arr = np.asarray(vals, dtype=np.float64)
    const = np.full(10, arr[0])
    assert grubbs_filter(const).all()
    m1, m2 = grubbs_filter(arr), grubbs_filter(arr)
    assert np.array_equal(m1, m2)
