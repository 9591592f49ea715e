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


def _chunk_layout(n: int, chunk: int = 64, stride: int = 48):
    """Pure-python mirror of q_chunk_overlap's integer arithmetic."""
    n_chunks = 1 if n <= chunk else (n - chunk + stride - 1) // stride + 1
    out = []
    for i in range(n_chunks):
        start = i * stride
        length = min(chunk, n - start)
        out.append((start, length))
    return out


@given(n=st.integers(min_value=1, max_value=5000))
@settings(max_examples=500, deadline=None)
def test_chunk_layout_covers_exactly(n):
    """For ANY document length: every token falls in >= 1 chunk, no chunk
    is empty or overruns the document, the last chunk ends exactly at n,
    and consecutive chunks overlap by exactly chunk-stride (except a
    shorter final chunk)."""
    chunks = _chunk_layout(n)
    assert chunks[0][0] == 0
    assert all(1 <= ln <= 64 for _, ln in chunks)
    assert all(s + ln <= n for s, ln in chunks)
    assert chunks[-1][0] + chunks[-1][1] == n
    covered = set()
    for s, ln in chunks:
        covered.update(range(s, s + ln))
    assert covered == set(range(n))
    # a further chunk would be redundant: the last start must still add
    # new tokens (start < n and previous chunks end before n)
    if len(chunks) > 1:
        prev_end = chunks[-2][0] + chunks[-2][1]
        assert prev_end < n


@given(
    tokens=st.lists(st.integers(min_value=1, max_value=900), min_size=1, max_size=60),
    budget=st.integers(min_value=16, max_value=1024),
)
@settings(max_examples=300, deadline=None)
def test_sequence_packing_spans(tokens, budget):
    """For ANY shard content and budget: per-doc chunk spans are
    contiguous and consistent with the running sum (the q_sequence_packing
    integer arithmetic), and every chunk boundary crossing is counted."""
    cum = 0
    for n in tokens:
        tok_start, cum = cum, cum + n
        chunk_start = tok_start // budget
        chunk_end = (cum - 1) // budget
        n_chunks = chunk_end - chunk_start + 1
        assert chunk_start <= chunk_end
        assert n_chunks >= 1
        # crossings: a doc spans exactly the chunks its token range touches
        assert n_chunks == len({t // budget for t in range(tok_start, cum)})


# gaps drawn to straddle every decision boundary of IsBehavingKit:
# exactly the 480 s rate floor (the strict-< edge), just inside/outside
# it, the 1800 s interval cap, and a penalty-clearing jump
_gap_s = st.sampled_from([1, 60, 479, 480, 481, 1799, 1800, 1801, 14400, 20000])


@given(gaps=st.lists(_gap_s, min_size=1, max_size=60))
@settings(max_examples=300, deadline=None)
def test_throttle_step_invariants(gaps):
    """IsBehavingKit invariants for ANY record sequence (the shared
    _throttle_step drives the streaming handler, the graded batch twin,
    and — as mirrored text — the DuckDB oracle):
    - the first record is always accepted; count increments by 1;
    - the interval estimate stays in (0, INTERVAL_CAP_S] (deltas are
      capped, the running mean of capped deltas cannot exceed the cap);
    - every record inside a penalty window is dropped, and the penalty
      is NOT extended by in-penalty records;
    - a fresh throttle fires only with count >= 3, delta < 480 s AND
      updated interval < 480 s — re-derived here from the published
      constants, not from the step function's own branches."""
    from mysense_spark.streaming.state import (
        INTERVAL_CAP_S,
        THROTTLE_MIN_COUNT,
        THROTTLE_PENALTY_S,
        THROTTLE_RATE_S,
        _throttle_step,
    )

    e = 1_700_000_000_000_000
    count, interval, last, pen = 0, float(INTERVAL_CAP_S), None, 0
    prev_pen = 0
    for i, g in enumerate(gaps):
        if i:
            e += g * 1_000_000
        prev_count, prev_interval, prev_last, prev_pen = count, interval, last, pen
        accepted, count, interval, last, pen = _throttle_step(e, count, interval, last, pen)
        assert count == prev_count + 1
        assert 0.0 < interval <= float(INTERVAL_CAP_S)
        if i == 0:
            assert accepted
            continue
        # independent re-derivation of the decision
        d = min(e - prev_last, INTERVAL_CAP_S * 1_000_000)
        want_interval = (prev_interval * prev_count + d / 1e6) / (prev_count + 1)
        assert interval == want_interval
        if e < prev_pen:
            assert not accepted and pen == prev_pen, "penalty must not extend"
        elif (
            prev_count >= THROTTLE_MIN_COUNT
            and d < THROTTLE_RATE_S * 1_000_000
            and want_interval < THROTTLE_RATE_S
        ):
            assert not accepted and pen == e + THROTTLE_PENALTY_S * 1_000_000
        else:
            assert accepted and pen == prev_pen
