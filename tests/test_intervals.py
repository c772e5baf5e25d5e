import numpy as np

from haslr_tpu.core.intervals import (
    best_supported_interval,
    weighted_interval_scheduling,
)


def _brute_force_wis(q_start, q_end, weight):
    """Exhaustive max-weight non-overlapping subset (for small n)."""
    n = len(q_start)
    best = 0
    for mask in range(1 << n):
        idx = [i for i in range(n) if mask >> i & 1]
        ok = all(
            q_end[idx[k]] <= q_start[idx[k + 1]] for k in range(len(idx) - 1)
        )
        if ok:
            best = max(best, sum(weight[i] for i in idx))
    return best


def test_wis_empty():
    assert weighted_interval_scheduling([], [], []) == []


def test_wis_single():
    assert weighted_interval_scheduling([0], [5], [10]) == [0]


def test_wis_chain():
    # three non-overlapping intervals are all chosen
    qs = [0, 10, 20]
    qe = [10, 20, 30]
    w = [5, 5, 5]
    assert weighted_interval_scheduling(qs, qe, w) == [0, 1, 2]


def test_wis_overlap_prefers_weight():
    # overlapping pair: heavier wins
    qs = [0, 5]
    qe = [10, 15]
    w = [5, 50]
    assert weighted_interval_scheduling(qs, qe, w) == [1]
    w = [50, 5]
    assert weighted_interval_scheduling(qs, qe, w) == [0]


def test_wis_matches_bruteforce():
    rng = np.random.default_rng(3)
    for _ in range(200):
        n = int(rng.integers(1, 9))
        qs = rng.integers(0, 40, n)
        length = rng.integers(1, 15, n)
        qe = qs + length
        order = np.lexsort((qs, qe))  # reference sort: by (q_end, q_start)
        qs, qe = qs[order], qe[order]
        w = rng.integers(1, 30, n)
        chosen = weighted_interval_scheduling(qs, qe, w)
        # chosen intervals must be pairwise compatible in order
        for k in range(len(chosen) - 1):
            assert qe[chosen[k]] <= qs[chosen[k + 1]]
        assert sum(w[i] for i in chosen) == _brute_force_wis(qs, qe, w)


def test_best_supported_interval_basic():
    # three intervals, the middle region covered by all three
    begs = np.array([0, 2, 4])
    ends = np.array([10, 12, 14])
    ids = np.array([0, 1, 2])
    beg, end, lrs = best_supported_interval(begs, ends, ids, strict=False)
    assert (beg, end) == (4, 10)
    assert lrs == {0, 1, 2}
    beg, end, lrs = best_supported_interval(begs, ends, ids, strict=True)
    assert (beg, end) == (4, 10)
    assert lrs == {0, 1, 2}


def test_best_supported_interval_strictness():
    # two disjoint intervals with equal support of 1: the non-strict variant
    # keeps updating (takes the later one), the strict variant keeps the first
    begs = np.array([0, 20])
    ends = np.array([10, 30])
    ids = np.array([0, 1])
    beg, end, lrs = best_supported_interval(begs, ends, ids, strict=False)
    assert (beg, end, lrs) == (20, 30, {1})
    beg, end, lrs = best_supported_interval(begs, ends, ids, strict=True)
    assert (beg, end, lrs) == (0, 10, {0})
