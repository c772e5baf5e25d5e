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


def test_wis_matches_reference_literal():
    """The bounded parent-pointer DP must reproduce the reference's
    track-list DP (Longread.cpp:570-601) exactly, including on inputs
    where overlap fixing left q_end unsorted."""

    def reference_literal(q_start, q_end, weight):
        n = len(q_start)
        if n == 0:
            return []
        dp = [0] * n
        track = [[] for _ in range(n)]
        dp[0] = weight[0]
        track[0] = [0]
        for i in range(1, n):
            j = -1
            for jj in range(i - 1, -1, -1):
                if q_end[jj] <= q_start[i]:
                    j = jj
                    break
            if j != -1:
                if weight[i] + dp[j] > dp[i - 1]:
                    dp[i] = weight[i] + dp[j]
                    track[i] = track[j] + [i]
                else:
                    dp[i] = dp[i - 1]
                    track[i] = track[i - 1]
            else:
                if weight[i] > dp[i - 1]:
                    dp[i] = weight[i]
                    track[i] = [i]
                else:
                    dp[i] = dp[i - 1]
                    track[i] = track[i - 1]
        return track[n - 1]

    rng = np.random.default_rng(4)
    for trial in range(200):
        n = int(rng.integers(1, 40))
        qs = rng.integers(0, 500, n)
        qe = qs + rng.integers(1, 120, n)
        order = np.lexsort((qs, qe))
        qs, qe = qs[order], qe[order]
        if trial % 3 == 0:
            # simulate fix_overlapping_alignments perturbing q_end
            idx = rng.integers(0, n)
            qe[idx] = max(qs[idx] + 1, qe[idx] - int(rng.integers(0, 50)))
        w = rng.integers(1, 1000, n)
        assert weighted_interval_scheduling(qs, qe, w) == \
            reference_literal(list(qs), list(qe), list(w))


def test_wis_large_input_bounded():
    """Reads with tens of thousands of alignments must complete quickly
    (the reference's fixed dp[10000] arrays are UB there; see
    docs/DESIGN.md)."""
    import time

    rng = np.random.default_rng(5)
    n = 20000
    qs = rng.integers(0, 1_000_000, n)
    qe = qs + rng.integers(1, 5000, n)
    order = np.lexsort((qs, qe))
    qs, qe = qs[order], qe[order]
    w = rng.integers(1, 1000, n)
    t0 = time.time()
    out = weighted_interval_scheduling(qs, qe, w)
    assert time.time() - t0 < 20
    assert len(out) > 0
    chosen_e = qe[out]
    chosen_s = qs[out]
    assert (chosen_s[1:] >= chosen_e[:-1]).all()


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
