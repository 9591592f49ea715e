"""Pins for bench.py's noise protocol (pure threshold logic — no Spark).

The r10 calibration probe exists because of a RECORDED r9 failure:
daily_qc_report (untouched code, empty git diff) read 0.79 s in the
committed r8 detail and 1.50 s in r9's uniformly inflated window; its
standalone re-run landed in the SAME window and the protocol marked
confirmed_regression=true. These tests replay those exact numbers
through the factored thresholds."""

import bench


def test_r9_inflated_window_no_longer_confirms_untouched_query():
    """Replay of the r9 daily_qc_report incident: prior 0.79 s, suite
    1.50 s, standalone 1.50 s (same stall window). With the probe
    reading the same window's inflation (factor = 1.50/0.79 ≈ 1.9) the
    corrected standalone divides back to its prior level — NOT
    confirmed. The query is still flagged suspect (1.50 > 1.8×0.79 at
    the suite's cleanest-moment factor 1.0 if the stall was temporal),
    which is correct: suspects are cheap, confirmations are claims."""
    prior, suite, standalone = 0.79, 1.50, 1.50
    window_factor = standalone / prior  # what the adjacent probe reads
    assert bench.is_suspect(suite, prior, factor=1.0)
    assert not bench.is_confirmed(standalone, prior, factor=window_factor)
    # even the conservative like-for-like window mean r9 measured (1.15)
    # moves the corrected ratio to 1.65 — a PARTIAL correction; only a
    # probe adjacent to the re-run (factor_confirm) fully cancels it,
    # which is why bench.py probes again between suite and re-runs
    assert bench.is_confirmed(standalone, prior, factor=1.15)


def test_real_regression_still_confirms_through_calibration():
    """A genuine 3x slowdown on a clean host (probe factor 1.0) must
    still confirm — and must KEEP confirming in a moderately inflated
    window, because the regression ratio exceeds inflation."""
    prior = 0.79
    regressed = 3 * prior
    assert bench.is_suspect(regressed, prior, factor=1.0)
    assert bench.is_confirmed(regressed, prior, factor=1.0)
    assert bench.is_confirmed(regressed, prior, factor=1.2)


def test_threshold_edges_and_missing_priors():
    """Missing priors or probes disable the comparison (never suspect),
    a failed query (-1) is never suspect, and the host-speed correction
    is ONE-SIDED in BOTH predicates (r11, after the r10 advice): the
    probe (pure CPU) and the suite (scan/shuffle/scheduler)
    demonstrably move independently (first r10 window: probe 24%
    faster, same-code suite 7% slower), so a probe FASTER than the
    committed prior must neither confirm regressions the absolute
    readings do not support (unfloored confirm manufactured six on
    untouched code) nor inflate every suite reading into a spurious
    standalone re-run (wasted bench wall-clock)."""
    assert not bench.is_suspect(1.5, 0.0, factor=1.0)   # no prior
    assert not bench.is_suspect(-1.0, 0.79, factor=1.0)  # failed query
    assert not bench.is_suspect(1.5, 0.79, factor=0.0)   # no prior probe
    assert not bench.is_suspect(1.3, 1.0, factor=1.0)
    assert not bench.is_suspect(1.0, 1.0, factor=0.5)   # floored at 1.0 (r11)
    assert bench.is_suspect(2.0, 1.0, factor=0.5)       # real 2x still suspect
    assert bench.is_suspect(2.0, 1.0, factor=1.1)       # slow probe corroborates
    assert not bench.is_suspect(2.0, 1.0, factor=1.2)   # ...or excuses
    assert not bench.is_confirmed(1.0, 1.0, factor=0.5)  # floored at 1.0
    assert not bench.is_confirmed(1.204, 1.002, factor=0.786)  # the r10 case
    assert bench.is_confirmed(1.6, 1.0, factor=0.5)      # real 1.6x still confirms
    # bench.py confirms only when BOTH readings exceed the threshold,
    # each corrected by ITS OWN window's factor. The r10 incident (suite
    # 1.552 vs prior 1.392, standalone 2.346 — a stall hit the RE-RUN):
    # the suite leg alone disconfirms, whatever the re-run read
    assert bench.is_confirmed(2.346, 1.392, factor=1.0)       # re-run leg
    assert not bench.is_confirmed(1.552, 1.392, factor=1.0)   # suite leg vetoes
    # ...and the reverse mixing (a clean-window suite regression plus a
    # stalled re-run window) must still confirm: both legs exceed the
    # threshold under their own factors
    assert bench.is_confirmed(1.9, 1.0, factor=1.0)           # suite, clean window
    assert bench.is_confirmed(2.5, 1.0, factor=1.4)           # re-run, stalled window
