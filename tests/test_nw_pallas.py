"""Pallas NW kernel equivalence (interpret mode on CPU; the same kernel is
validated bit-exact against the scan on real TPU hardware)."""

import numpy as np
import pytest

import jax.numpy as jnp

from haslr_tpu.kernels import nw
from haslr_tpu.kernels.nw_pallas import GROUP, nw_dirs_pallas


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
