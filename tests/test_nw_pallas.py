"""Pallas NW kernel equivalence (interpret mode on CPU; the same kernel is
validated bit-exact against the scan on real TPU hardware)."""

import numpy as np
import pytest

import jax.numpy as jnp

from haslr_tpu.kernels import nw
from haslr_tpu.kernels.nw_pallas import (
    GROUP,
    nw_dirs_pallas,
    nw_mapping_pallas,
)


def test_pallas_dirs_match_scan_interpret():
    B, S, W = GROUP, 128, 128
    rng = np.random.default_rng(1)
    drafts = rng.integers(0, 4, (B, S)).astype(np.uint8)
    reads = np.where(
        rng.random((B, S)) < 0.08, (drafts + 1) % 4, drafts
    ).astype(np.uint8)
    r_lens = rng.integers(80, 120, B).astype(np.int32)
    d_lens = (r_lens + rng.integers(-4, 5, B)).astype(np.int32)
    args = (
        jnp.asarray(reads), jnp.asarray(r_lens),
        jnp.asarray(drafts), jnp.asarray(d_lens),
    )
    ref = np.asarray(nw._nw_scan(*args, S, S, W, 5, -4, -8))
    got = np.asarray(nw_dirs_pallas(*args, S, S, W, 5, -4, -8, True))
    base = nw.band_bases(S, S, W)
    T = 2 * S
    for t in range(1, T + 1):
        j = base[t] + np.arange(W)
        i = t - j
        for b in range(B):
            valid = (i >= 0) & (i <= r_lens[b]) & (j >= 0) & (j <= d_lens[b])
            np.testing.assert_array_equal(
                ref[t, b][valid], got[t, b][valid]
            )

def test_fused_mapping_matches_xla_traceback_interpret():
    """The fused DP+traceback kernel reproduces the XLA mapping bit-exactly,
    including indel-heavy reads, empty padding rows, and the dynamic
    per-group t_max bound."""
    B, S, W = 2 * GROUP, 256, 128
    rng = np.random.default_rng(7)
    reads = np.full((B, S), 4, np.uint8)
    drafts = np.full((B, S), 4, np.uint8)
    r_lens = np.zeros(B, np.int32)
    d_lens = np.zeros(B, np.int32)
    for b in range(B - 4):  # last 4 rows stay pure padding
        dl = int(rng.integers(50, S - 10))
        d = rng.integers(0, 4, dl).astype(np.uint8)
        r = []
        for ch in d:
            x = rng.random()
            if x < 0.03:
                continue  # deletion
            if x < 0.06:
                r.append(int(rng.integers(0, 4)))  # insertion
            if x < 0.10:
                r.append(int(rng.integers(0, 4)))  # substitution
                continue
            r.append(int(ch))
        r = np.array(r[:S], np.uint8)
        if abs(len(r) - dl) >= W // 2 - 4:
            r = r[:dl]
        reads[b, : len(r)] = r
        drafts[b, :dl] = d
        r_lens[b] = len(r)
        d_lens[b] = dl
    args = (
        jnp.asarray(reads), jnp.asarray(r_lens),
        jnp.asarray(drafts), jnp.asarray(d_lens),
    )
    ref = np.asarray(nw._align_mapping(*args, S, S, W, 5, -4, -8, False))
    got = np.asarray(
        nw_mapping_pallas(*args, S, S, W, 5, -4, -8, True)
    ).astype(np.int16)
    np.testing.assert_array_equal(ref, got)

def test_votes_kernel_tables_match_scatter_interpret():
    """The vote-plane kernel + MXU matmul reduction produces the exact
    vote tables of the mapping kernel + XLA scatter path (base counts,
    both insertion ranks, coverage spans, read counts), including indel
    runs, band-dropped rows, and pure padding rows."""
    import jax

    from haslr_tpu.kernels import consensus_dense as cd
    from haslr_tpu.kernels.nw_pallas import nw_votes_pallas

    B, S, W = 2 * GROUP, 256, 128
    N = 8
    rng = np.random.default_rng(11)
    reads = np.full((B, S), 4, np.uint8)
    drafts_n = np.full((N, S), 4, np.uint8)
    d_lens_n = np.zeros(N, np.int32)
    for n in range(N):
        dl = int(rng.integers(60, S - 10))
        drafts_n[n, :dl] = rng.integers(0, 4, dl)
        d_lens_n[n] = dl
    win_idx = rng.integers(0, N, B).astype(np.int32)
    r_lens = np.zeros(B, np.int32)
    for b in range(B - 4):  # last rows stay padding
        d = drafts_n[win_idx[b]][: d_lens_n[win_idx[b]]]
        r = []
        for ch in d:
            x = rng.random()
            if x < 0.04:
                continue
            if x < 0.10:
                r.append(int(rng.integers(0, 4)))
            if x < 0.14:
                r.append(int(rng.integers(0, 4)))
                continue
            r.append(int(ch))
        r = np.array(r[:S], np.uint8)
        reads[b, : len(r)] = r
        r_lens[b] = len(r)
    dl_r = d_lens_n[win_idx]
    ok = (r_lens > 0) & (dl_r > 0) & (np.abs(r_lens - dl_r) < W // 2 - 4)
    dr_r = drafts_n[win_idx]
    args = (
        jnp.asarray(reads), jnp.asarray(r_lens),
        jnp.asarray(dr_r), jnp.asarray(dl_r),
    )
    mapping = nw._align_mapping(*args, S, S, W, 5, -4, -8, False)
    ref = cd._scatter_votes(
        mapping, jnp.asarray(reads), jnp.asarray(r_lens),
        jnp.asarray(win_idx), jnp.asarray(ok), N, S,
    )
    planes, stats = nw_votes_pallas(*args, S, S, W, 5, -4, -8, True)
    got = cd._kernel_vote_tables(
        planes, stats, jnp.asarray(win_idx), jnp.asarray(ok), N, S
    )
    names = ("counts", "cov_diff", "ins1", "ins2", "n_reads")
    for name, a, b in zip(names, ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), name)
