"""Oversized-window consensus: windows beyond the largest device bucket
must be SPLIT, POLISHED, and STITCHED — not emitted raw.

The reference SPOAs every window regardless of length
(``Assemble.cpp:499-555``); the device engine's buckets cap at 64 kb, so
``consensus_dense`` splits longer windows into colinear segments
(:func:`haslr_tpu.kernels.consensus_dense._expand_oversized`) and
concatenates the polished pieces.  These tests shrink the bucket table so
the split path runs at CI scale on the CPU backend, and assert the
stitched output actually corrects draft errors (i.e. it IS polished).
"""

import numpy as np
import pytest

from haslr_tpu.kernels import consensus_dense as cd


def _mutate(rng, codes, err):
    out = []
    for c in codes:
        r = rng.random()
        if r < err / 3:
            continue
        if r < 2 * err / 3:
            out.append(rng.integers(0, 4))
        else:
            out.append(int(c))
            if r < err:
                out.append(rng.integers(0, 4))
    return np.array(out, np.uint8)


@pytest.fixture
def small_buckets(monkeypatch):
    monkeypatch.setattr(cd, "BUCKETS", (128, 256, 512))
    monkeypatch.setattr(cd, "SEG_TARGET", 300)
    monkeypatch.setattr(cd, "SEG_SEARCH", 64)


def test_refined_cuts_track_indels():
    """Cut positions follow the homologous position, not the proportional
    one, when a support has a large early insertion."""
    rng = np.random.default_rng(0)
    draft = rng.integers(0, 4, 2000).astype(np.uint8)
    # support = draft with 120 bases inserted at position 100
    ins = rng.integers(0, 4, 120).astype(np.uint8)
    sup = np.concatenate([draft[:100], ins, draft[100:]])
    cuts_d = np.array([500, 1000, 1500])
    cp = cd._refined_cuts(sup, draft, cuts_d)
    assert cp[0] == 0 and cp[-1] == len(sup)
    # homologous positions are shifted by the 120-base insertion
    for got, want in zip(cp[1:-1], cuts_d + 120):
        assert abs(got - want) <= 2


def test_oversized_window_is_polished(small_buckets):
    """A window whose draft exceeds the (shrunken) top bucket gets split,
    polished, and stitched; the stitched consensus must recover the true
    sequence far better than the unpolished median draft."""
    rng = np.random.default_rng(1)
    true = rng.integers(0, 4, 1500).astype(np.uint8)
    supports = [_mutate(rng, true, 0.04) for _ in range(11)]

    warns = []
    out = cd.dense_consensus([supports], warn=warns.append)
    assert len(out) == 1
    cons = out[0]
    assert any("split into" in w for w in warns)

    def identity(a, b):
        # quick banded LCS-free identity proxy: shared 21-mer fraction
        def kset(x):
            v = np.lib.stride_tricks.sliding_window_view(x, 21)
            return {bytes(row) for row in v}
        ka, kb = kset(a), kset(b)
        return len(ka & kb) / max(1, len(kb))

    med = sorted(supports, key=len)[len(supports) // 2]
    id_cons = identity(cons, true)
    id_med = identity(med, true)
    assert id_cons > 0.95, (id_cons, id_med)
    assert id_cons > id_med + 0.2


def test_normal_windows_unaffected(small_buckets):
    """Windows under the cap go through the ordinary bucket path with
    byte-identical results whether or not the split logic is present."""
    rng = np.random.default_rng(2)
    true = rng.integers(0, 4, 200).astype(np.uint8)
    supports = [_mutate(rng, true, 0.05) for _ in range(9)]
    out = cd.dense_consensus([supports, []])
    got = cd._dense_consensus_work(
        [supports], 5, -4, -8, 2, None, None
    )
    assert np.array_equal(out[0], got[0])
    assert out[1].size == 0


def test_mixed_oversized_and_normal(small_buckets):
    """Plan bookkeeping: oversized and normal windows interleaved keep
    their positions in the result list."""
    rng = np.random.default_rng(3)
    t_big = rng.integers(0, 4, 1200).astype(np.uint8)
    t_small = rng.integers(0, 4, 180).astype(np.uint8)
    wins = [
        [_mutate(rng, t_small, 0.03) for _ in range(7)],
        [],
        [_mutate(rng, t_big, 0.03) for _ in range(7)],
    ]
    out = cd.dense_consensus(wins)
    assert len(out) == 3
    assert out[1].size == 0
    assert abs(len(out[0]) - len(t_small)) <= 6
    assert abs(len(out[2]) - len(t_big)) <= 30
