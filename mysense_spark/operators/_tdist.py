"""Minimal Student-t inverse CDF (no scipy in the runtime).

Standard regularized-incomplete-beta continued fraction (Lentz) + bisection.
Used only by the Grubbs outlier test (statistics/grubbs.py:795-801 computes
the same critical value via scipy.stats.t.ppf).
"""

from __future__ import annotations

import math
from functools import lru_cache


def _betacf(a: float, b: float, x: float) -> float:
    MAXIT, EPS, FPMIN = 200, 3e-14, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < EPS:
            break
    return h


def _betai(a: float, b: float, x: float) -> float:
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    lbeta = math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
    bt = math.exp(lbeta + a * math.log(x) + b * math.log(1.0 - x))
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def t_cdf(x: float, df: float) -> float:
    if x == 0.0:
        return 0.5
    p = 0.5 * _betai(df / 2.0, 0.5, df / (df + x * x))
    return p if x < 0 else 1.0 - p


@lru_cache(maxsize=65536)
def t_ppf(q: float, df: float) -> float:
    """Inverse CDF by bisection; q in (0,1). Memoized: the Grubbs driver
    calls it with q = alpha/2n, df = n-2 — a function of n alone, and n
    only spans window sizes, so the cache hit rate is ~100%."""
    if not 0.0 < q < 1.0:
        raise ValueError("q must be in (0,1)")
    lo, hi = -500.0, 500.0
    # widen the bracket geometrically when the quantile lies outside
    # [-500, 500] (extreme q at low df — e.g. t_ppf(1e-5, 1) ~ -31831):
    # a hard clamp would silently return +/-500 and the lru_cache would
    # pin the wrong critical value forever
    for _ in range(60):
        if t_cdf(lo, df) <= q:
            break
        lo *= 4.0
    for _ in range(60):
        if t_cdf(hi, df) >= q:
            break
        hi *= 4.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if t_cdf(mid, df) < q:
            lo = mid
        else:
            hi = mid
        if hi - lo < 1e-12 * max(1.0, abs(mid)):
            break
    return 0.5 * (lo + hi)
