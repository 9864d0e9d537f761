"""Pure unit tests for bench.py's throttle-validity gate.

The scaling headline (north rule: two-parallelism-level efficiency)
is the median over rep pairs that survive `_valid_rep_indices`. The
gate must discard throttle-contaminated reps in BOTH observed failure
modes:

1. one rep visibly stalled inside a clean run (r4 driver run), and
2. a window where every hi-level rep is uniformly slowed so the
   absolute per-level check sees nothing, but the paired cpu_hi/cpu_lo
   growth ratio splits clean from stalled (second r5 builder run).

All numbers below are the real recorded runs (BENCH_DETAILS.json of
the respective rounds), not synthetic.
"""

import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _valid_rep_indices  # noqa: E402


def _reps(cpus):
    return [{"tree_cpu_s": float(c), "wall": 1.0} for c in cpus]


def test_single_stalled_rep_discarded_r4_driver_run():
    # r4 driver run, 1c level: rep 1 burned 143 CPU-s vs 94-99 peers.
    lo = _reps([94, 143, 96, 99])
    hi = _reps([100, 104, 101, 103])
    assert _valid_rep_indices(lo, hi) == [0, 2, 3]


def test_uniformly_throttled_hi_level_caught_by_growth_ratio():
    # Second r5 builder run: hi CPUs all within 20% of their own min
    # (111*1.2 = 133 > 131) so the absolute check passes everything,
    # but growth ratios [1.24, 1.11, 1.25, 1.11] split exactly where
    # the per-rep efficiencies [0.585, 0.795, 0.622, 0.916] do.
    lo = _reps([106, 100, 98, 112])
    hi = _reps([131, 111, 122, 124])
    valid = _valid_rep_indices(lo, hi)
    assert valid == [1, 3]
    effs = [0.585, 0.795, 0.622, 0.916]
    assert statistics.median([effs[i] for i in valid]) >= 0.8


def test_clean_run_keeps_enough_reps_for_a_median():
    # Committed r5 run (clean window): at most one borderline rep
    # (growth 1.195 vs min 1.043) may be discarded; the median of the
    # survivors must stay >= the gate threshold.
    lo = _reps([94, 94, 87, 100])
    hi = _reps([103, 98, 104, 111])
    valid = _valid_rep_indices(lo, hi)
    assert len(valid) >= 3
    effs = [0.828, 0.895, 0.747, 0.820]
    assert statistics.median([effs[i] for i in valid]) >= 0.8


def test_lo_throttled_rep_cannot_become_growth_reference():
    # A rep whose LO leg is stalled has an artificially LOW growth
    # ratio; if it were the reference it would discard honest reps.
    # The absolute check removes it first.
    lo = _reps([150, 100, 101, 99])   # rep 0: stalled 1c leg
    hi = _reps([155, 110, 112, 110])  # ratio 1.03 vs honest ~1.10
    valid = _valid_rep_indices(lo, hi)
    assert 0 not in valid
    assert valid == [1, 2, 3]


def test_fewer_than_two_pairs_pass():
    assert _valid_rep_indices([], []) == []
    assert _valid_rep_indices(_reps([100]), _reps([110])) == [0]


def test_zero_cpu_reps_do_not_divide_by_zero():
    lo = _reps([0, 0])
    hi = _reps([0, 0])
    assert _valid_rep_indices(lo, hi) == [0, 1]


def test_discard_reasons_name_the_actual_check():
    """BENCH.md's status column must name the check that rejected a
    rep: an absolute tree-CPU discard and a growth-ratio discard are
    contradicted by different table columns, and a mislabeled reason
    reads as a gate bug to a reviewer."""
    from bench import _rep_validity

    lo = _reps([94, 143, 96, 99])
    hi = _reps([100, 104, 101, 103])
    valid, reasons = _rep_validity(lo, hi)
    assert valid == [0, 2, 3]
    assert reasons == {1: "tree-CPU outlier @lo"}

    lo = _reps([106, 100, 98, 112])
    hi = _reps([131, 111, 122, 124])
    valid, reasons = _rep_validity(lo, hi)
    assert valid == [1, 3]
    assert reasons == {0: "cpu-growth-ratio outlier",
                       2: "cpu-growth-ratio outlier"}
