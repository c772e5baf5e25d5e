"""Pallas TPU kernels for banded NW: direction matrix and fused traceback.

The hand-scheduled twin of :func:`haslr_tpu.kernels.nw._nw_scan_inner`:
one grid program processes a GROUP of reads (sublane dimension) through
``T = R + D`` anti-diagonals.  The key trick is that with band offsets
moving by {0, 1} per step, the read/draft bases under the band form
*sliding windows*: per step either the read window shifts right by one
lane (band advanced along the read) or the draft window shifts left by one
(band advanced along the draft), each pulling in a single (GROUP, 1)
column from VMEM — no gathers anywhere in the inner loop.

Two entry points:

- :func:`nw_dirs_pallas` — DP only; streams the (T+1, B, W) direction
  tensor to HBM (the XLA scan traceback consumes it).
- :func:`nw_mapping_pallas` — **fused DP + traceback**: the direction
  rows stay in VMEM scratch and a wavefront traceback (t descending; each
  read moves exactly when ``t == i + j``) runs in the same program,
  emitting the per-base (B, R) read→draft mapping directly.  The 100s-of-
  MB direction tensor never touches HBM, and the per-program loop bound
  is the *actual* max anti-diagonal of the group's reads (scalar-
  prefetched), not the padded T — both the DP and the traceback stop at
  real data.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from haslr_tpu.kernels.nw import band_bases

NEG = np.int32(-(10**8))
DIAG, UP, LEFT = 0, 1, 2
GROUP = 32  # reads per grid program (int8 sublane tile: 32)


def _shift_right1(x, new_col):
    """y[:, k] = x[:, k-1], y[:, 0] = new_col (lane shift toward higher k)."""
    W = x.shape[1]
    rolled = pltpu.roll(x, 1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane == 0, new_col, rolled)


def _shift_left1(x, new_col):
    """y[:, k] = x[:, k+1], y[:, W-1] = new_col."""
    W = x.shape[1]
    rolled = pltpu.roll(x, W - 1, axis=1)  # == roll by -1
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane == W - 1, new_col, rolled)


def _lane_shift(h, off, fill):
    """y[:, k] = h[:, k + off] for off in {-1, 0, 1, 2}; out-of-range lanes
    get ``fill``.  ``off`` is a traced scalar: all variants are computed and
    selected (cheap VPU rolls)."""
    W = h.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
    outs = []
    for o in (-1, 0, 1, 2):
        r = pltpu.roll(h, (W - o) % W, axis=1)  # == roll by -o
        if o > 0:
            r = jnp.where(lane >= W - o, fill, r)
        elif o < 0:
            r = jnp.where(lane < -o, fill, r)
        outs.append(r)
    res = outs[1]
    res = jnp.where(off == -1, outs[0], res)
    res = jnp.where(off == 1, outs[2], res)
    res = jnp.where(off == 2, outs[3], res)
    return res


def _dp_phase(base_ref, reads_ref, drafts_ref, rl, dl, dirs_ref, t_hi,
              *, R, D, W, match, mismatch, gap):
    """Run the banded DP up to anti-diagonal ``t_hi`` (inclusive), writing
    direction rows to ``dirs_ref`` (HBM output block or VMEM scratch)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (GROUP, W), 1)

    # Loop-carry inits must carry the natural {0,0} vector layout of the
    # loop-body outputs; constant (or constant-folded) inits get replicated
    # layouts and Mosaic cannot relayout non-replicated -> replicated at
    # the loop back-edge.  min(codes, 0) == 0 for 2-bit code data but is
    # not foldable, pinning each init to a distinct data-dependent value.
    anchor_r = jnp.minimum(reads_ref[:, 0:W], 0)
    anchor_d = jnp.minimum(drafts_ref[:, 0:W], 0)
    h_init = jnp.full((GROUP, W), NEG, jnp.int32) + anchor_r
    h0 = jnp.where(lane == 0, 0, h_init) + anchor_d
    # draft window at t=0: db[k] = drafts[k-1] (k=0 lane holds pad)
    d_first = drafts_ref[:, 0:W]
    db0 = _shift_right1(
        d_first, jnp.full((GROUP, W), 4, jnp.int32) + anchor_r
    )
    rb0 = jnp.full((GROUP, W), 4, jnp.int32) + anchor_d
    dirs_ref[0] = jnp.zeros((GROUP, W), jnp.uint8)

    def read_col(ref, idx, size):
        """One (GROUP, 1) column at dynamic index: Mosaic requires lane-dim
        dynamic slices to be 128-aligned, so load the aligned 128-chunk and
        mask-reduce the wanted lane."""
        aligned = pl.multiple_of((idx // 128) * 128, 128)
        chunk = ref[:, pl.ds(aligned, 128)]
        off = idx - aligned
        sel = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 128), 1) == off
        return jnp.sum(jnp.where(sel, chunk, 0), axis=1, keepdims=True)

    def step(t, carry):
        h_prev2, h_prev1, rb, db = carry
        b_t = base_ref[t]
        s1 = b_t - base_ref[t - 1]
        s2 = b_t - base_ref[t - 2]
        # advance sliding base windows
        ri = jnp.clip(t - b_t - 1, 0, R - 1)
        new_r = read_col(reads_ref, ri, R)
        dj = jnp.clip(b_t + W - 2, 0, D - 1)
        new_d = read_col(drafts_ref, dj, D)
        adv_read = s1 == 0
        rb = jnp.where(adv_read, _shift_right1(rb, new_r), rb)
        db = jnp.where(adv_read, db, _shift_left1(db, new_d))
        # neighbors
        up = _lane_shift(h_prev1, s1, NEG)
        left = _lane_shift(h_prev1, s1 - 1, NEG)
        diag = _lane_shift(h_prev2, s2 - 1, NEG)
        sub = jnp.where(rb == db, match, mismatch)
        j = b_t + lane
        i = t - j
        cand_d = jnp.where((i >= 1) & (j >= 1), diag + sub, NEG)
        cand_u = jnp.where(i >= 1, up + gap, NEG)
        cand_l = jnp.where(j >= 1, left + gap, NEG)
        h = jnp.maximum(cand_d, jnp.maximum(cand_u, cand_l))
        # keep the selection in int32-land: an i1 mask born from int32 lanes
        # cannot relayout onto int8 vectors in Mosaic
        d = jnp.where(
            h == cand_d,
            jnp.int32(DIAG),
            jnp.where(h == cand_u, jnp.int32(UP), jnp.int32(LEFT)),
        )
        valid = (i >= 0) & (i <= rl) & (j >= 0) & (j <= dl)
        h = jnp.where(valid, h, NEG)
        dirs_ref[t] = d.astype(jnp.uint8)
        return h_prev1, h, rb, db

    jax.lax.fori_loop(1, t_hi + 1, step, (h_init, h0, rb0, db0),
                      unroll=False)


def _kernel(base_ref, reads_ref, drafts_ref, rlen_ref, dlen_ref, dirs_ref,
            *, R, D, W, match, mismatch, gap):
    _dp_phase(base_ref, reads_ref, drafts_ref, rlen_ref[:], dlen_ref[:],
              dirs_ref, R + D, R=R, D=D, W=W, match=match,
              mismatch=mismatch, gap=gap)


def _fused_kernel(base_ref, tmax_ref, reads_ref, drafts_ref, rlen_ref,
                  dlen_ref, map_ref, dirs_vmem, *, R, D, W, match, mismatch,
                  gap):
    """DP into VMEM scratch, then wavefront traceback → (GROUP, R) mapping.

    Traceback walks ``t`` from the group's max anti-diagonal down to 1;
    a read takes its move exactly when ``t == i + j`` (every move strictly
    decreases ``i + j``), so one descending sweep replays every read's
    full walk in lockstep without per-read control flow.  Mapping encoding
    matches :func:`haslr_tpu.kernels.nw.traceback_batch`.
    """
    rl = rlen_ref[:]  # (GROUP, 1) int32
    dl = dlen_ref[:]
    t_max = tmax_ref[pl.program_id(0)]
    _dp_phase(base_ref, reads_ref, drafts_ref, rl, dl, dirs_vmem, t_max,
              R=R, D=D, W=W, match=match, mismatch=mismatch, gap=gap)

    lane_w = jax.lax.broadcasted_iota(jnp.int32, (GROUP, W), 1)
    col_r = jax.lax.broadcasted_iota(jnp.int32, (GROUP, R), 1)
    # data-dependent init (see layout note in _dp_phase)
    mapping0 = jnp.full((GROUP, R), -1, jnp.int32) + jnp.minimum(
        reads_ref[:, 0:R], 0
    )

    def tb_step(k, carry):
        i, j, mapping = carry
        t = t_max - k
        active = ((i > 0) | (j > 0)) & (i + j == t)
        lane = j - base_ref[t]
        in_band = (lane >= 0) & (lane < W)
        row = dirs_vmem[t].astype(jnp.int32)  # (GROUP, W)
        picked = jnp.sum(
            jnp.where(lane_w == lane, row, 0), axis=1, keepdims=True
        )
        d = jnp.where(in_band, picked, jnp.int32(LEFT))
        d = jnp.where(i == 0, jnp.int32(LEFT), d)
        d = jnp.where(j == 0, jnp.int32(UP), d)
        is_diag = active & (d == DIAG)
        is_up = active & (d == UP)
        is_left = active & (d == LEFT)
        write = is_diag | is_up
        val = jnp.where(is_diag, j - 1, -(j + 2))
        mapping = jnp.where((col_r == i - 1) & write, val, mapping)
        i = i - (is_diag | is_up)
        j = j - (is_diag | is_left)
        return i, j, mapping

    _, _, mapping = jax.lax.fori_loop(
        0, t_max, tb_step, (rl, dl, mapping0), unroll=False
    )
    map_ref[:] = mapping


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10))
def nw_dirs_pallas(reads, r_lens, drafts, d_lens, R, D, W, match, mismatch,
                   gap, interpret=False):
    """Direction tensor (T+1, B, W) via the Pallas kernel (B % 8 == 0).

    ``interpret=True`` runs the kernel in the Pallas interpreter (the only
    mode available on CPU; used by the test suite)."""
    B = reads.shape[0]
    assert B % GROUP == 0
    T = R + D
    base = jnp.asarray(band_bases(R, D, W), dtype=jnp.int32)
    grid = (B // GROUP,)
    kernel = functools.partial(
        _kernel, R=R, D=D, W=W, match=match, mismatch=mismatch, gap=gap
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((GROUP, R), lambda i, *_: (i, 0)),
                pl.BlockSpec((GROUP, D), lambda i, *_: (i, 0)),
                pl.BlockSpec((GROUP, 1), lambda i, *_: (i, 0)),
                pl.BlockSpec((GROUP, 1), lambda i, *_: (i, 0)),
            ],
            out_specs=pl.BlockSpec(
                (T + 1, GROUP, W), lambda i, *_: (0, i, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((T + 1, B, W), jnp.uint8),
        interpret=interpret,
    )(
        base,
        reads.astype(jnp.int32),   # int32 lanes avoid int8 tiling limits
        drafts.astype(jnp.int32),
        r_lens.astype(jnp.int32).reshape(B, 1),
        d_lens.astype(jnp.int32).reshape(B, 1),
    )


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10))
def nw_mapping_pallas(reads, r_lens, drafts, d_lens, R, D, W, match,
                      mismatch, gap, interpret=False):
    """Fused banded-NW DP + traceback; returns the (B, R) mapping (int32,
    encoding of :func:`haslr_tpu.kernels.nw.traceback_batch`) with the
    direction tensor confined to VMEM scratch (B % GROUP == 0)."""
    B = reads.shape[0]
    assert B % GROUP == 0
    T = R + D
    base = jnp.asarray(band_bases(R, D, W), dtype=jnp.int32)
    rl = r_lens.astype(jnp.int32)
    dl = d_lens.astype(jnp.int32)
    group_tmax = (rl + dl).reshape(B // GROUP, GROUP).max(axis=1)
    # every group runs at least one step so fori_loop bounds stay trivial
    group_tmax = jnp.maximum(group_tmax, 1)
    kernel = functools.partial(
        _fused_kernel, R=R, D=D, W=W, match=match, mismatch=mismatch,
        gap=gap,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B // GROUP,),
            in_specs=[
                pl.BlockSpec((GROUP, R), lambda i, *_: (i, 0)),
                pl.BlockSpec((GROUP, D), lambda i, *_: (i, 0)),
                pl.BlockSpec((GROUP, 1), lambda i, *_: (i, 0)),
                pl.BlockSpec((GROUP, 1), lambda i, *_: (i, 0)),
            ],
            out_specs=pl.BlockSpec((GROUP, R), lambda i, *_: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((T + 1, GROUP, W), jnp.uint8),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, R), jnp.int32),
        interpret=interpret,
    )(
        base,
        group_tmax,
        reads.astype(jnp.int32),
        drafts.astype(jnp.int32),
        rl.reshape(B, 1),
        dl.reshape(B, 1),
    )
