"""Row-scan banded NW: half the DP cells of the anti-diagonal wavefront.

The wavefront formulation (:mod:`haslr_tpu.kernels.nw`,
:mod:`haslr_tpu.kernels.nw_pallas`) advances ``T = R + D`` anti-diagonals
of W lanes.  Because its band is W wide ALONG ANTI-DIAGONALS, its per-ROW
column coverage is ~2W — twice what the admission gate
(``|r_len - d_len| < W/2 - 4``) requires.  This module scans one READ ROW
per step instead: R steps x a W-lane row window following the
length-proportional diagonal, covering the same useful drift (+-W/2
columns) with half the cells.

The in-row LEFT dependency (``H[i][j] = H[i][j-1] + gap``) that the
wavefront dodges by construction is collapsed to a closed form, exact for
linear gap penalties::

    tmp[k] = max(diag[k] + sub[k], up[k] + gap)        # prev-row only
    H[i][k] = gap*k + prefix_max(tmp[k] - gap*k)       # left-gap chains

(``prefix_max`` = 7 masked shift-max doubling levels on 128 lanes; in XLA
an ``associative_scan``).  Directions keep the wavefront's exact
tie-break order (DIAG preferred, then UP, then LEFT) because
``H == max(tmp, H[j-1] + gap)`` reproduces the sequential 3-candidate
max.  Traceback visits one ROW per lockstep iteration: a packed
prefix-max over the direction row finds each read's in-row LEFT-run stop
(the rightmost non-LEFT cell at or left of its column) so a whole run of
draft deletions collapses into the single UP/DIAG move that follows it —
R iterations instead of R + D.

CAVEAT: this is a NARROWER band than the wavefront's, so mappings are not
bit-identical to the wavefront engine on extreme-drift alignments (paths
that stray >= W/2 columns off the proportional diagonal).  For every read
the admission gate accepts, real paths use a fraction of that budget; the
wavefront engine remains in-tree as the cross-check oracle
(``tests/test_nw_rowscan.py``).  The Pallas kernels and the XLA fallback
here ARE bit-identical to each other on every read, admitted or not
(asserted on hardware by ``bench.check_pallas_vs_scan``).

Reference role: SPOA's per-window sequence-to-graph alignment
(``Assemble.cpp:499-555``) and minimap2's base-level extension
(``bin/haslr.py:99``) — both served by this one batched kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = np.int32(-(10**8))
DIAG, UP, LEFT = 0, 1, 2
# per-program VMEM budget for the (R+1, G, W) direction scratch
DIRS_VMEM_BUDGET = 10 << 20

PREFIX_SHIFTS = (1, 2, 4, 8, 16, 32, 64)  # W = 128 doubling levels

# debug switches (trace time): skip the in-kernel traceback to measure
# the DP phase alone (outputs then meaningless); force a group size
TB_SKIP = False
GROUP_OVERRIDE: int | None = None

# unroll factors for the DP / traceback loops (trace time).  The loops
# are bound by fixed per-iteration overhead, not vector work (measured:
# G=64 does half the per-step tile work of G=128 at the SAME per-step
# time), so unrolling amortizes the control cost directly.  The loop
# bounds are dynamic (scalar-prefetched per-group r_max), which
# fori_loop's own `unroll` rejects — the unroll is MANUAL: a dynamic
# block loop whose body runs U statically-unrolled sub-steps, with the
# out-of-range tail sub-steps neutralized (DP: junk rows store to the
# never-read row 0; TB: activity requires r >= 1).
DP_UNROLL = 1
TB_UNROLL = 1

# independent read-group chains interleaved per grid program (trace
# time).  The DP/traceback recurrences are SEQUENTIAL dependency chains
# of vector ops, so a single chain is latency-bound, not
# throughput-bound (measured: doubling the rows per op barely moves the
# per-step time).  C chains of GROUP/C reads each carry C independent
# dataflows through the same loop body, letting the scheduler hide one
# chain's op latency behind another's.
N_CHAINS = 1

# DP diagnostic ablations (trace time; outputs WRONG when set) — used
# only to attribute per-step cost on hardware:
#   DIAG_NO_SUB:    skip both base windows, constant substitution score
#   DIAG_NO_PREFIX: skip the in-row prefix-max chain
#   DIAG_RB_DIRECT: load the read base via a 1-lane dynamic slice
#                   instead of the wide window+roll
DIAG_NO_SUB = False
DIAG_NO_PREFIX = False
DIAG_RB_DIRECT = False
#   DIAG_NO_STORE:  write every direction row to row 0 (tiny scratch) —
#                   measures pure DP compute scaling with GROUP
DIAG_NO_STORE = False


def _tb_loop(r_max, body, carry):
    """Descending traceback loop r = r_max .. 1 with manual unrolling;
    ``body(r, carry)`` must be a no-op when r < 1 (junk tail sub-steps
    pass r <= 0)."""
    U = TB_UNROLL
    if U <= 1:
        return jax.lax.fori_loop(
            0, r_max, lambda k, c: body(r_max - k, c), carry
        )

    def block(bk, c):
        k0 = bk * U
        for u in range(U):
            c = body(r_max - (k0 + u), c)
        return c

    return jax.lax.fori_loop(0, (r_max + U - 1) // U, block, carry)


def row_bases(R: int, D: int, W: int) -> np.ndarray:
    """Lane-0 draft column per read row i in [0, R]: the
    length-proportional diagonal minus W/2, clipped and monotone.  For the
    production shapes (R == D) consecutive steps are in {0, 1}."""
    i = np.arange(R + 1, dtype=np.int64)
    center = (i * D) // max(R, 1)
    hi = max(0, D - W + 1)
    base = np.clip(center - W // 2, 0, hi)
    base = np.maximum.accumulate(base)
    return base.astype(np.int32)


def rowscan_supported(R: int, D: int, W: int) -> bool:
    """The kernels assume the row band advances by {0, 1} columns per row
    (true whenever D <= R; all production call sites pad to R == D)."""
    return D <= R or bool((np.diff(row_bases(R, D, W)) <= 1).all())


def group_for(R: int, D: int, W: int) -> int:
    """Reads per grid program: largest of 128/64/32 whose direction
    scratch fits the VMEM budget (the row-scan scratch is (R+1, G, W) —
    half the wavefront's, so GROUP doubles at the same bucket size)."""
    for g in (128, 64, 32):
        if (R + 1) * g * W <= DIRS_VMEM_BUDGET:
            return g
    return 32


def use_pallas_for(B: int, R: int, D: int, W: int) -> bool:
    """TPU backend, whole 32-read groups, scratch within budget at the
    minimum group, and a {0,1}-step row band."""
    return (
        jax.devices()[0].platform == "tpu"
        and B % 32 == 0
        and (R + 1) * 32 * W <= DIRS_VMEM_BUDGET
        and rowscan_supported(R, D, W)
    )


def _pad_inputs(reads, drafts, W):
    """int32 lane-padded copies for the Pallas sliding-window loads
    (int8/int16 inputs hit Mosaic tiling limits; reads are NOT reversed —
    the row scan walks them forward)."""
    pad = ((0, 0), (0, 2 * W))
    rpad = jnp.pad(reads.astype(jnp.int32), pad, constant_values=4)
    dpad = jnp.pad(drafts.astype(jnp.int32), pad, constant_values=4)
    return rpad, dpad


# --------------------------------------------------------------------------
# XLA fallback (CPU / test path; bit-identical to the Pallas kernels)
# --------------------------------------------------------------------------


def _shift_lanes(x, off):
    """x[..., k + off] with NEG fill; ``off`` a traced scalar in [-1, 1]."""
    B, W = x.shape
    pad = jnp.full((B, 1), NEG, dtype=x.dtype)
    xp = jnp.concatenate([pad, x, pad], axis=1)  # lanes -1 .. W
    return jax.lax.dynamic_slice_in_dim(xp, off + 1, W, axis=1)


def _rowscan_dirs_inner(reads, r_lens, drafts, d_lens, R, D, W, match,
                        mismatch, gap):
    """Row-scan DP; returns dirs (R+1, B, W) uint8."""
    B = reads.shape[0]
    base = jnp.asarray(row_bases(R, D, W))
    lanes = jnp.arange(W, dtype=jnp.int32)
    glane = (gap * lanes)[None, :]
    rl = r_lens.astype(jnp.int32)[:, None]
    dl = d_lens.astype(jnp.int32)[:, None]
    # anchor the carry to a device-varying input (shard_map vma typing)
    zero_b = (r_lens.astype(jnp.int32) * 0)[:, None]
    h0 = jnp.where(lanes[None, :] <= dl, glane, NEG) + zero_b
    drafts_p = jnp.concatenate(
        [drafts, jnp.full((B, 1), 4, drafts.dtype)], axis=1
    )

    def step(h_prev, i):
        b_i = base[i]
        s = b_i - base[i - 1]
        up = _shift_lanes(h_prev, s)
        diag = _shift_lanes(h_prev, s - 1)
        j = b_i + lanes
        rb = jax.lax.dynamic_slice_in_dim(reads, i - 1, 1, axis=1)
        db = jnp.take(drafts_p, jnp.clip(j - 1, 0, D), axis=1)
        sub = jnp.where(rb == db, match, mismatch).astype(jnp.int32)
        cand_d = diag + sub
        cand_u = up + gap
        tmp = jnp.maximum(cand_d, cand_u)
        valid = (j[None, :] <= dl) & (i <= rl)
        x = jnp.where(valid, tmp, NEG) - glane
        pm = jax.lax.associative_scan(jnp.maximum, x, axis=1)
        h = glane + pm
        d = jnp.where(
            h == cand_d,
            jnp.uint8(DIAG),
            jnp.where(h == cand_u, jnp.uint8(UP), jnp.uint8(LEFT)),
        )
        h = jnp.where(valid, h, NEG)
        return h, d

    ts = jnp.arange(1, R + 1, dtype=jnp.int32)
    _, dirs = jax.lax.scan(step, h0, ts)
    return jnp.concatenate(
        [jnp.zeros((1, B, W), dtype=jnp.uint8), dirs], axis=0
    )


def _rowscan_mapping_inner(reads, r_lens, drafts, d_lens, R, D, W, match,
                           mismatch, gap):
    """DP + row-lockstep traceback on device; mapping (B, R) int32 in the
    encoding of :func:`haslr_tpu.kernels.nw.traceback_batch`."""
    B = reads.shape[0]
    dirs = _rowscan_dirs_inner(reads, r_lens, drafts, d_lens, R, D, W,
                               match, mismatch, gap)
    base = jnp.asarray(row_bases(R, D, W))
    bidx = jnp.arange(B)
    lanes = jnp.arange(W, dtype=jnp.int32)[None, :]

    def step(carry, r):
        i, j, mapping = carry
        active = i == r
        b_r = base[r]
        lane = j - b_r
        in_band = (lane >= 0) & (lane < W)
        row = dirs[r].astype(jnp.int32)
        val_k = jnp.where(row != LEFT, (lanes << 2) | row, -1)
        pm = jax.lax.associative_scan(jnp.maximum, val_k, axis=1)
        picked = jnp.take_along_axis(
            pm, jnp.clip(lane, 0, W - 1)[:, None], axis=1
        )[:, 0]
        forced = ~in_band | (picked < 0)
        d = jnp.where(forced, jnp.int32(UP), picked & 3)
        lane_f = jnp.where(forced, lane, picked >> 2)
        jp = b_r + lane_f
        is_diag = active & (d == DIAG)
        is_up = active & (d == UP)
        write = is_diag | is_up
        val = jnp.where(is_diag, jp - 1, -(jp + 2))
        idx = jnp.where(write, i - 1, R)  # non-writers hit the dump slot
        mapping = mapping.at[bidx, idx].set(val)
        i = i - active
        j = jnp.where(is_diag, jp - 1, jnp.where(is_up, jp, j))
        return (i, j, mapping), None

    mapping0 = jnp.full((B, R + 1), -1, jnp.int32) + (
        r_lens.astype(jnp.int32) * 0
    )[:, None]
    rs = jnp.arange(R, 0, -1, dtype=jnp.int32)
    (_, _, mapping), _ = jax.lax.scan(
        step,
        (r_lens.astype(jnp.int32), d_lens.astype(jnp.int32), mapping0),
        rs,
    )
    return mapping[:, :R]


# --------------------------------------------------------------------------
# Pallas kernels
# --------------------------------------------------------------------------


def _window_of(ref, o, size, W, sl=slice(None)):
    """(G, W) sliding window out[:, k] = ref[sl, o + k] for every k whose
    absolute index lands in [aligned, aligned + 2W) — true for all in-band
    lanes; others hold wrapped garbage (always masked downstream)."""
    WIDE = 2 * W
    aligned = jnp.clip((o // 128) * 128, 0, (size // 128) * 128)
    aligned = pl.multiple_of(aligned, 128)
    wide = ref[sl, pl.ds(aligned, WIDE)]
    shift = jnp.mod(aligned - o, WIDE)
    return pltpu.roll(wide, shift, axis=1)[:, :W]


def _chain_slices(GROUP):
    """Split a grid program's GROUP rows into N_CHAINS independent
    chains (sublane slices); falls back toward fewer chains when the
    group is too small to split."""
    C = max(1, N_CHAINS)
    while GROUP % C or GROUP // C < 32:
        C //= 2
    C = max(1, C)
    Gs = GROUP // C
    return [slice(c * Gs, (c + 1) * Gs) for c in range(C)], Gs


def _prefix_max(x, lane, W):
    """Exact per-row prefix max over the lane axis (shift-max doubling;
    out-of-range shifts fill with NEG, the identity for these values)."""
    for sh in PREFIX_SHIFTS:
        if sh >= W:
            break
        x = jnp.maximum(
            x, jnp.where(lane >= sh, pltpu.roll(x, sh, axis=1), NEG)
        )
    return x


def _dp_rowscan(base_ref, rpad_ref, dpad_ref, rl, dl, dirs_ref, r_hi,
                *, R, D, W, match, mismatch, gap, GROUP):
    """Row-scan DP up to row ``r_hi`` (inclusive), directions into
    ``dirs_ref``.  Identical arithmetic to :func:`_rowscan_dirs_inner`
    (see module docstring for the bit-equality argument); the GROUP rows
    advance as N_CHAINS independent interleaved chains (see above)."""
    chains, Gs = _chain_slices(GROUP)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Gs, W), 1)
    glane = gap * lane
    inf = jnp.asarray(-NEG, jnp.int32)
    cap_first = jnp.where(lane == 0, NEG, inf)
    cap_last = jnp.where(lane == W - 1, NEG, inf)
    rl_i = rl.astype(jnp.int32)
    dl_i = dl.astype(jnp.int32)

    h0 = tuple(
        jnp.where(lane <= dl_i[sl], glane, NEG) for sl in chains
    )
    dirs_ref[0] = jnp.zeros((GROUP, W), jnp.uint8)

    def rot1l(x):
        return pltpu.roll(x, W - 1, axis=1)

    def rot1r(x):
        return pltpu.roll(x, 1, axis=1)

    def step(i, hs):
        b_i = base_ref[i]
        s = b_i - base_ref[i - 1]
        if DIAG_NO_STORE:
            store_i = 0
        else:
            store_i = jnp.where(i <= r_hi, i, 0) if DP_UNROLL > 1 else i
        out = []
        for sl, h_prev in zip(chains, hs):
            up = jnp.where(
                s == 1, jnp.minimum(rot1l(h_prev), cap_last), h_prev
            )
            diag = jnp.where(
                s == 1, h_prev, jnp.minimum(rot1r(h_prev), cap_first)
            )
            if DIAG_NO_SUB:
                sub = jnp.where(h_prev > NEG, match, mismatch)
            else:
                rb = _window_of(rpad_ref, i - 1, R, W, sl)[:, :1]
                db = _window_of(dpad_ref, b_i - 1, D, W, sl)
                sub = jnp.where(rb == db, match, mismatch)
            cand_d = diag + sub
            cand_u = up + gap
            tmp = jnp.maximum(cand_d, cand_u)
            valid = (lane <= dl_i[sl] - b_i) & (i <= rl_i[sl])
            x = jnp.where(valid, tmp, NEG) - glane
            pm = x if DIAG_NO_PREFIX else _prefix_max(x, lane, W)
            h = glane + pm
            d = jnp.where(
                h == cand_d,
                jnp.int32(DIAG),
                jnp.where(h == cand_u, jnp.int32(UP), jnp.int32(LEFT)),
            )
            h = jnp.where(valid, h, NEG)
            dirs_ref[store_i, sl] = d.astype(jnp.uint8)
            out.append(h)
        return tuple(out)

    if DP_UNROLL <= 1:
        jax.lax.fori_loop(1, r_hi + 1, step, h0)
    else:
        U = DP_UNROLL

        def block(bk, h):
            i0 = 1 + bk * U
            for u in range(U):
                h = step(i0 + u, h)
            return h

        jax.lax.fori_loop(0, (r_hi + U - 1) // U, block, h0)


def _tb_resolve(dirs_vmem, base_ref, r, i, j, lane_w, W,
                sl=slice(None)):
    """One lockstep traceback row: consume each read's LEFT run and return
    (active, is_diag, is_up, jp) where jp is the acted-on column.  A
    no-op (active all-false) for r < 1 — the unrolled loop's junk tail
    sub-steps pass r <= 0."""
    r_c = jnp.maximum(r, 1)
    active = (i == r) & (r >= 1)
    b_r = base_ref[r_c]
    lane = j - b_r
    in_band = (lane >= 0) & (lane < W)
    row = dirs_vmem[r_c, sl].astype(jnp.int32)
    val_k = jnp.where(row != LEFT, (lane_w << 2) | row, -1)
    pm = _prefix_max(val_k, lane_w, W)
    picked = jnp.sum(
        jnp.where(lane_w == lane, pm, 0), axis=1, keepdims=True
    )
    forced = jnp.logical_not(in_band) | (picked < 0)
    d = jnp.where(forced, jnp.int32(UP), picked & 3)
    lane_f = jnp.where(forced, lane, picked >> 2)
    jp = b_r + lane_f
    is_diag = active & (d == DIAG)
    is_up = active & (d == UP)
    return active, is_diag, is_up, jp


def _mapping_kernel(base_ref, rmax_ref, rpad_ref, dpad_ref, rlen_ref,
                    dlen_ref, map_ref, dirs_vmem, *, R, D, W, match,
                    mismatch, gap, GROUP):
    """Fused DP + traceback -> (GROUP, R) mapping, directions in VMEM."""
    rl = rlen_ref[:]  # (GROUP, 1) int32
    dl = dlen_ref[:]
    r_max = rmax_ref[pl.program_id(0)]
    _dp_rowscan(base_ref, rpad_ref, dpad_ref, rl, dl, dirs_vmem, r_max,
                R=R, D=D, W=W, match=match, mismatch=mismatch, gap=gap,
                GROUP=GROUP)

    chains, Gs = _chain_slices(GROUP)
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (Gs, W), 1)
    col_r = jax.lax.broadcasted_iota(jnp.int32, (Gs, R), 1)
    # data-dependent init (Mosaic loop-carry layout; min(code, 0) == 0)
    mapping0s = tuple(
        jnp.full((Gs, R), -1, jnp.int32)
        + jnp.minimum(rpad_ref[sl, 0:R], 0)
        for sl in chains
    )
    if TB_SKIP:
        for sl, m0 in zip(chains, mapping0s):
            map_ref[sl] = m0
        return

    def tb_step(r, carry):
        out = []
        for sl, (i, j, mapping) in zip(chains, carry):
            active, is_diag, is_up, jp = _tb_resolve(
                dirs_vmem, base_ref, r, i, j, lane_w, W, sl
            )
            write = is_diag | is_up
            val = jnp.where(is_diag, jp - 1, -(jp + 2))
            mapping = jnp.where((col_r == i - 1) & write, val, mapping)
            i = i - active
            j = jnp.where(is_diag, jp - 1, jnp.where(is_up, jp, j))
            out.append((i, j, mapping))
        return tuple(out)

    carry0 = tuple(
        (rl[sl], dl[sl], m0) for sl, m0 in zip(chains, mapping0s)
    )
    final = _tb_loop(r_max, tb_step, carry0)
    for sl, (_i, _j, mapping) in zip(chains, final):
        map_ref[sl] = mapping


def _votes_kernel(base_ref, rmax_ref, rpad_ref, dpad_ref, rlen_ref,
                  dlen_ref, planes_ref, stats_ref, dirs_vmem, pb_vmem,
                  pa_vmem, pa2_vmem, *, R, D, W, match, mismatch, gap,
                  GROUP):
    """DP + traceback emitting DRAFT-INDEXED per-read vote planes (same
    outputs as :func:`haslr_tpu.kernels.nw_pallas._votes_kernel`; the
    insertion-run register logic is identical — one UP/DIAG act per row,
    LEFT runs consumed silently with q = run_anchor + 1 preserved).

    Per-step write targets: the diag vote lands at jp - 1 in
    [b_r - 1, b_r + W - 2]; the eager run flush lands at
    q = run_anchor + 1 in [b_r, b_r + W] (the anchor was set one row up,
    whose band base is at most b_r + 1) — so the diag vote uses a 2W
    window aligned below b_r - 1 and the flush one aligned below b_r."""
    rl = rlen_ref[:]  # (GROUP, 1) int32
    dl = dlen_ref[:]
    r_max = rmax_ref[pl.program_id(0)]
    _dp_rowscan(base_ref, rpad_ref, dpad_ref, rl, dl, dirs_vmem, r_max,
                R=R, D=D, W=W, match=match, mismatch=mismatch, gap=gap,
                GROUP=GROUP)

    DQ = D + 128
    WIDE = 2 * W
    PW = pb_vmem.shape[1]
    chains, Gs = _chain_slices(GROUP)
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (Gs, W), 1)
    lane_2w = jax.lax.broadcasted_iota(jnp.int32, (Gs, WIDE), 1)
    lane_pw = jax.lax.broadcasted_iota(jnp.int32, (Gs, PW), 1)
    none8 = jnp.full((GROUP, PW), 4, jnp.int8)
    pb_vmem[:] = none8
    pa_vmem[:] = none8
    pa2_vmem[:] = none8
    cap_b = (PW - WIDE) // 128 * 128

    def rmw(ref, sl, aligned, cond, p, val8):
        wide = ref[sl, pl.ds(aligned, WIDE)]
        wide = jnp.where((lane_2w == p) & cond, val8, wide)
        ref[sl, pl.ds(aligned, WIDE)] = wide

    def tb_step(r, carry):
        r_c = jnp.maximum(r, 1)
        b_r = base_ref[r_c]
        aligned_d = jnp.clip((b_r - 1) // 128 * 128, 0, cap_b)
        aligned_d = pl.multiple_of(aligned_d, 128)
        aligned_q = jnp.clip(b_r // 128 * 128, 0, cap_b)
        aligned_q = pl.multiple_of(aligned_q, 128)
        out = []
        for sl, (i, j, run_anchor, b_a, b_b, jmn, jmx) in zip(
            chains, carry
        ):
            active, is_diag, is_up, jp = _tb_resolve(
                dirs_vmem, base_ref, r, i, j, lane_w, W, sl
            )
            # the active read's base this row is reads[r - 1] (i == r)
            rb_i = _window_of(rpad_ref, r_c - 1, R, W, sl)[:, :1] & 3
            rb8 = rb_i.astype(jnp.int8)
            # aligned-base vote at col jp - 1 + span stats (diag acts)
            rmw(pb_vmem, sl, aligned_d, is_diag, jp - 1 - aligned_d, rb8)
            jmn = jnp.where(is_diag, jnp.minimum(jmn, jp - 1), jmn)
            jmx = jnp.where(is_diag, jnp.maximum(jmx, jp - 1), jmx)
            # insertion runs: consecutive UP acts at one anchor; eager
            # flush on the next non-continuing act
            anchor_now = jp - 1
            same_run = is_up & (run_anchor == anchor_now)
            has_run = run_anchor >= -1
            ended = active & has_run & jnp.logical_not(same_run)
            q_t = run_anchor + 1
            rmw(pa_vmem, sl, aligned_q, ended, q_t - aligned_q,
                b_a.astype(jnp.int8))
            rmw(pa2_vmem, sl, aligned_q, ended, q_t - aligned_q,
                b_b.astype(jnp.int8))
            b_b = jnp.where(same_run, b_a, jnp.where(is_up, 4, b_b))
            b_a = jnp.where(is_up, rb_i, jnp.where(ended, 4, b_a))
            run_anchor = jnp.where(
                is_up, anchor_now, jnp.where(ended, -9, run_anchor)
            )
            i = i - active
            j = jnp.where(is_diag, jp - 1, jnp.where(is_up, jp, j))
            out.append((i, j, run_anchor, b_a, b_b, jmn, jmx))
        return tuple(out)

    def reg0(v):
        # data-dependent inits (Mosaic loop-carry layout)
        return tuple(
            jnp.full((Gs, 1), v, jnp.int32)
            + jnp.minimum(rpad_ref[sl, 0:1], 0)
            for sl in chains
        )

    carry0 = tuple(
        (rl[sl], dl[sl], ra, ba, bb, mn, mx)
        for sl, ra, ba, bb, mn, mx in zip(
            chains, reg0(-9), reg0(4), reg0(4), reg0(jnp.int32(1 << 29)),
            reg0(-1),
        )
    )
    final = _tb_loop(r_max, tb_step, carry0)
    lane_s = jax.lax.broadcasted_iota(jnp.int32, (Gs, 128), 1)
    for sl, (_i, _j, run_anchor, b_a, b_b, jmn, jmx) in zip(
        chains, final
    ):
        # final flush: a run still open when the walk leaves the loop
        # (its last act was the UP into row 0) targets q = run_anchor+1,
        # anywhere in [0, D] — one full-width masked write, once
        has_run = run_anchor >= -1
        q_t = run_anchor + 1
        pa_vmem[sl] = jnp.where(
            (lane_pw == q_t) & has_run, b_a.astype(jnp.int8),
            pa_vmem[sl],
        )
        pa2_vmem[sl] = jnp.where(
            (lane_pw == q_t) & has_run, b_b.astype(jnp.int8),
            pa2_vmem[sl],
        )
        stats_ref[sl] = jnp.where(
            lane_s == 0, jmn, jnp.where(lane_s == 1, jmx, 0)
        )
    planes_ref[:, 0:D] = pb_vmem[:, 0:D].astype(jnp.uint8)
    planes_ref[:, D : D + DQ] = pa_vmem[:, 0:DQ].astype(jnp.uint8)
    planes_ref[:, D + DQ : D + 2 * DQ] = pa2_vmem[:, 0:DQ] \
        .astype(jnp.uint8)


# --------------------------------------------------------------------------
# CIGAR-run emission (the aligner's extension path)
#
# Shipping the dense (B, S) mapping to the host costs ~2 bytes per draft
# column through the ~5-20 MB/s TPU relay — 57 s of the round-4 4.6 Mb
# e2e (E2E_TPU.json extend.collect_d2h).  The traceback already walks the
# alignment, so these variants run the exact run-length state machine the
# host converter would (mapcig.cpp) DURING the walk and ship only the
# (B, MAXR) run list: one packed uint16 per CIGAR run instead of one
# int16 per draft column.
#
# Runs are emitted in TRACEBACK order (reverse of the final CIGAR): each
# iteration emits the consumed LEFT run (a D op) first, then merges the
# UP/DIAG act into the open M/I run.  The host reverses.  Encoding:
# ``(len - 1) << 2 | op`` with op M=0, I=1, D=2 (haslr_tpu.core.cigar) —
# len <= 16384 fits 16 bits for every bucket.  Reads with more than MAXR
# runs report their true count so the caller can fall back; no run list
# is silently truncated into a wrong CIGAR.
# --------------------------------------------------------------------------


def _runs_emit(runs, n_runs, lane_m, cond, op, length):
    """Append ``(op, length)`` at slot ``n_runs`` where ``cond`` (full-
    width lane select; slots beyond MAXR drop, the count keeps growing so
    overflow is detectable)."""
    val = ((length - 1) << 2) | op
    runs = jnp.where((lane_m == n_runs) & cond, val, runs)
    return runs, n_runs + cond


def _rowscan_cigar_inner(reads, r_lens, drafts, d_lens, R, D, W, match,
                         mismatch, gap, MAXR):
    """XLA DP + traceback emitting CIGAR runs; returns
    ``(runs (B, MAXR) int32, n_runs (B,) int32)``."""
    B = reads.shape[0]
    dirs = _rowscan_dirs_inner(reads, r_lens, drafts, d_lens, R, D, W,
                               match, mismatch, gap)
    base = jnp.asarray(row_bases(R, D, W))
    lanes = jnp.arange(W, dtype=jnp.int32)[None, :]
    lane_m = jnp.arange(MAXR, dtype=jnp.int32)[None, :]
    zero_b = (r_lens.astype(jnp.int32) * 0)[:, None]

    def step(carry, r):
        i, j, cur_op, cur_len, n_runs, runs = carry
        active = i == r
        b_r = base[r]
        lane = j - b_r
        in_band = (lane >= 0) & (lane < W)
        row = dirs[r].astype(jnp.int32)
        val_k = jnp.where(row != LEFT, (lanes << 2) | row, -1)
        pm = jax.lax.associative_scan(jnp.maximum, val_k, axis=1)
        picked = jnp.take_along_axis(
            pm, jnp.clip(lane, 0, W - 1)[:, None], axis=1
        )[:, 0]
        forced = ~in_band | (picked < 0)
        d = jnp.where(forced, jnp.int32(UP), picked & 3)
        lane_f = jnp.where(forced, lane, picked >> 2)
        jp = b_r + lane_f
        is_diag = (active & (d == DIAG))[:, None]
        act = active[:, None]
        len_d = (j - jp)[:, None]
        emit_d = act & (len_d > 0)
        flush1 = emit_d & (cur_len > 0)
        runs, n_runs = _runs_emit(runs, n_runs, lane_m, flush1, cur_op,
                                  cur_len)
        runs, n_runs = _runs_emit(runs, n_runs, lane_m, emit_d,
                                  jnp.int32(LEFT), len_d)
        cur_len = jnp.where(emit_d, 0, cur_len)
        act_op = jnp.where(is_diag, jnp.int32(DIAG), jnp.int32(UP))
        same = act & (cur_len > 0) & (cur_op == act_op)
        flush2 = act & (cur_len > 0) & (cur_op != act_op)
        runs, n_runs = _runs_emit(runs, n_runs, lane_m, flush2, cur_op,
                                  cur_len)
        cur_len = jnp.where(act, jnp.where(same, cur_len + 1, 1), cur_len)
        cur_op = jnp.where(act, act_op, cur_op)
        i = i - active
        j = jnp.where(is_diag[:, 0], jp - 1, jnp.where(active, jp, j))
        return (i, j, cur_op, cur_len, n_runs, runs), None

    runs0 = jnp.full((B, MAXR), 0, jnp.int32) + zero_b
    rs_seq = jnp.arange(R, 0, -1, dtype=jnp.int32)
    (_, j, cur_op, cur_len, n_runs, runs), _ = jax.lax.scan(
        step,
        (
            r_lens.astype(jnp.int32),
            d_lens.astype(jnp.int32),
            jnp.full((B, 1), -1, jnp.int32) + zero_b,
            jnp.zeros((B, 1), jnp.int32) + zero_b,
            jnp.zeros((B, 1), jnp.int32) + zero_b,
            runs0,
        ),
        rs_seq,
    )
    runs, n_runs = _runs_emit(runs, n_runs, lane_m, cur_len > 0, cur_op,
                              cur_len)
    runs, n_runs = _runs_emit(runs, n_runs, lane_m, (j > 0)[:, None],
                              jnp.int32(LEFT), j[:, None])
    return runs, n_runs[:, 0]


def _cigar_kernel(base_ref, rmax_ref, rpad_ref, dpad_ref, rlen_ref,
                  dlen_ref, runs_ref, cnt_ref, dirs_vmem, *, R, D, W,
                  match, mismatch, gap, GROUP, MAXR):
    """Fused DP + run-emitting traceback (Pallas twin of
    :func:`_rowscan_cigar_inner`)."""
    rl = rlen_ref[:]  # (GROUP, 1) int32
    dl = dlen_ref[:]
    r_max = rmax_ref[pl.program_id(0)]
    _dp_rowscan(base_ref, rpad_ref, dpad_ref, rl, dl, dirs_vmem, r_max,
                R=R, D=D, W=W, match=match, mismatch=mismatch, gap=gap,
                GROUP=GROUP)

    chains, Gs = _chain_slices(GROUP)
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (Gs, W), 1)
    lane_m = jax.lax.broadcasted_iota(jnp.int32, (Gs, MAXR), 1)

    def tb_step(r, carry):
        out = []
        for sl, (i, j, cur_op, cur_len, n_runs, runs) in zip(
            chains, carry
        ):
            active, is_diag, is_up, jp = _tb_resolve(
                dirs_vmem, base_ref, r, i, j, lane_w, W, sl
            )
            len_d = j - jp
            emit_d = active & (len_d > 0)
            flush1 = emit_d & (cur_len > 0)
            runs, n_runs = _runs_emit(runs, n_runs, lane_m, flush1,
                                      cur_op, cur_len)
            runs, n_runs = _runs_emit(runs, n_runs, lane_m, emit_d,
                                      jnp.int32(LEFT), len_d)
            cur_len = jnp.where(emit_d, 0, cur_len)
            act_op = jnp.where(is_diag, jnp.int32(DIAG), jnp.int32(UP))
            same = active & (cur_len > 0) & (cur_op == act_op)
            flush2 = active & (cur_len > 0) & (cur_op != act_op)
            runs, n_runs = _runs_emit(runs, n_runs, lane_m, flush2,
                                      cur_op, cur_len)
            cur_len = jnp.where(active, jnp.where(same, cur_len + 1, 1),
                                cur_len)
            cur_op = jnp.where(active, act_op, cur_op)
            i = i - active
            j = jnp.where(is_diag, jp - 1, jnp.where(active, jp, j))
            out.append((i, j, cur_op, cur_len, n_runs, runs))
        return tuple(out)

    def z1(sl):
        return jnp.minimum(rpad_ref[sl, 0:1], 0)

    carry0 = tuple(
        (
            rl[sl], dl[sl],
            jnp.full((Gs, 1), -1, jnp.int32) + z1(sl),
            jnp.zeros((Gs, 1), jnp.int32) + z1(sl),
            jnp.zeros((Gs, 1), jnp.int32) + z1(sl),
            jnp.zeros((Gs, MAXR), jnp.int32) + z1(sl),
        )
        for sl in chains
    )
    final = _tb_loop(r_max, tb_step, carry0)
    lane_s = jax.lax.broadcasted_iota(jnp.int32, (Gs, 128), 1)
    for sl, (_i, j, cur_op, cur_len, n_runs, runs) in zip(chains, final):
        runs, n_runs = _runs_emit(runs, n_runs, lane_m, cur_len > 0,
                                  cur_op, cur_len)
        runs, n_runs = _runs_emit(runs, n_runs, lane_m, j > 0,
                                  jnp.int32(LEFT), j)
        runs_ref[sl] = runs
        cnt_ref[sl] = jnp.where(lane_s == 0, n_runs, 0)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10, 11))
def rowscan_cigar_pallas(reads, r_lens, drafts, d_lens, R, D, W, match,
                         mismatch, gap, MAXR, interpret=False):
    """Fused row-scan DP + CIGAR-run traceback; returns
    ``(runs (B, MAXR) int32, cnt (B, 128) int32)`` with ``cnt[:, 0]`` the
    true run count (> MAXR = overflow, fall back)."""
    B = reads.shape[0]
    G, group_rmax = _group_and_rmax(B, R, D, W, r_lens)
    base = _base_padded(R, D, W)
    kernel = functools.partial(
        _cigar_kernel, R=R, D=D, W=W, match=match, mismatch=mismatch,
        gap=gap, GROUP=G, MAXR=MAXR,
    )
    rpad, dpad = _pad_inputs(reads, drafts, W)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B // G,),
            in_specs=[
                pl.BlockSpec((G, R + 2 * W), lambda i, *_: (i, 0)),
                pl.BlockSpec((G, D + 2 * W), lambda i, *_: (i, 0)),
                pl.BlockSpec((G, 1), lambda i, *_: (i, 0)),
                pl.BlockSpec((G, 1), lambda i, *_: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((G, MAXR), lambda i, *_: (i, 0)),
                pl.BlockSpec((G, 128), lambda i, *_: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((R + 1, G, W), jnp.uint8),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, MAXR), jnp.int32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
        ],
        interpret=interpret,
    )(
        base,
        group_rmax,
        rpad,
        dpad,
        r_lens.astype(jnp.int32).reshape(B, 1),
        d_lens.astype(jnp.int32).reshape(B, 1),
    )


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10, 11))
def _cigar_device(reads, r_lens, drafts, d_lens, R, D, W, match, mismatch,
                  gap, MAXR, use_pallas):
    if use_pallas:
        runs, cnt = rowscan_cigar_pallas(
            reads, r_lens, drafts, d_lens, R, D, W, match, mismatch, gap,
            MAXR,
        )
        n_runs = cnt[:, 0]
    else:
        runs, n_runs = _rowscan_cigar_inner(
            reads, r_lens, drafts, d_lens, R, D, W, match, mismatch, gap,
            MAXR,
        )
    # (len - 1) << 2 | op <= 65535 for every bucket: ship uint16
    return runs.astype(jnp.uint16), n_runs


def cigar_runs_device_raw(reads, r_lens, drafts, d_lens, W=128, match=2,
                          mismatch=-4, gap=-2, maxr=None):
    """Device-resident align + CIGAR-run traceback; returns DEVICE arrays
    ``(runs (B, MAXR) uint16, n_runs (B,) int32)`` — the D2H payload is
    one packed run per CIGAR op instead of one int16 per draft column."""
    R = reads.shape[1]
    D = drafts.shape[1]
    if maxr is None:
        maxr = max(128, R // 4)
    use_pallas = use_pallas_for(reads.shape[0], R, D, W)
    return _cigar_device(
        jnp.asarray(reads),
        jnp.asarray(r_lens, dtype=jnp.int32),
        jnp.asarray(drafts),
        jnp.asarray(d_lens, dtype=jnp.int32),
        R, D, W, match, mismatch, gap, maxr, use_pallas,
    )


@functools.lru_cache(maxsize=None)
def _make_sharded_cigar(mesh, R, D, W, match, mismatch, gap, maxr,
                        use_pallas):
    """shard_mapped CIGAR-run extraction over the mesh's ``dp`` axis
    (rows independent, no collective; runs come back row-sharded)."""
    from jax.sharding import PartitionSpec as P

    def _one(reads, r_lens, drafts, d_lens):
        return _cigar_device(
            reads, r_lens, drafts, d_lens, R, D, W, match, mismatch, gap,
            maxr, use_pallas,
        )

    sm = jax.shard_map(
        _one,
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=(P("dp"), P("dp")),
        check_vma=True,
    )
    return jax.jit(sm)


def cigar_runs_device_sharded(reads, r_lens, drafts, d_lens, mesh, W=128,
                              match=2, mismatch=-4, gap=-2, maxr=None):
    """Data-parallel :func:`cigar_runs_device_raw` over a ``dp`` mesh
    (B must divide evenly; pad with zero-length rows)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    B, R = reads.shape
    D = drafts.shape[1]
    if maxr is None:
        maxr = max(128, R // 4)
    n_dev = int(mesh.devices.size)
    assert B % n_dev == 0
    use_pallas = use_pallas_for(B // n_dev, R, D, W)
    fn = _make_sharded_cigar(mesh, R, D, W, match, mismatch, gap, maxr,
                             use_pallas)
    sh = NamedSharding(mesh, P("dp"))
    return fn(
        jax.device_put(np.ascontiguousarray(reads), sh),
        jax.device_put(np.ascontiguousarray(r_lens, np.int32), sh),
        jax.device_put(np.ascontiguousarray(drafts), sh),
        jax.device_put(np.ascontiguousarray(d_lens, np.int32), sh),
    )


def _base_padded(R, D, W):
    """Row bases padded by the max unroll factor: the unrolled loops' junk
    tail sub-steps index past row R (their s stays 0 on the repeated last
    value, and their stores/activity are masked)."""
    b = row_bases(R, D, W)
    return jnp.asarray(
        np.concatenate([b, np.repeat(b[-1:], 8)]), dtype=jnp.int32
    )


def _group_and_rmax(B, R, D, W, r_lens):
    G = GROUP_OVERRIDE or group_for(R, D, W)
    while B % G:
        G //= 2
    assert G >= 32 and B % G == 0
    rl = r_lens.astype(jnp.int32)
    group_rmax = rl.reshape(B // G, G).max(axis=1)
    return G, jnp.maximum(group_rmax, 1)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10))
def rowscan_mapping_pallas(reads, r_lens, drafts, d_lens, R, D, W, match,
                           mismatch, gap, interpret=False):
    """Fused row-scan DP + traceback; (B, R) int32 mapping (encoding of
    :func:`haslr_tpu.kernels.nw.traceback_batch`)."""
    B = reads.shape[0]
    G, group_rmax = _group_and_rmax(B, R, D, W, r_lens)
    base = _base_padded(R, D, W)
    kernel = functools.partial(
        _mapping_kernel, R=R, D=D, W=W, match=match, mismatch=mismatch,
        gap=gap, GROUP=G,
    )
    rpad, dpad = _pad_inputs(reads, drafts, W)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B // G,),
            in_specs=[
                pl.BlockSpec((G, R + 2 * W), lambda i, *_: (i, 0)),
                pl.BlockSpec((G, D + 2 * W), lambda i, *_: (i, 0)),
                pl.BlockSpec((G, 1), lambda i, *_: (i, 0)),
                pl.BlockSpec((G, 1), lambda i, *_: (i, 0)),
            ],
            out_specs=pl.BlockSpec((G, R), lambda i, *_: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM(
                    (2 if DIAG_NO_STORE else R + 1, G, W), jnp.uint8
                ),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, R), jnp.int32),
        interpret=interpret,
    )(
        base,
        group_rmax,
        rpad,
        dpad,
        r_lens.astype(jnp.int32).reshape(B, 1),
        d_lens.astype(jnp.int32).reshape(B, 1),
    )


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10))
def rowscan_votes_pallas(reads, r_lens, drafts, d_lens, R, D, W, match,
                         mismatch, gap, interpret=False):
    """Fused row-scan DP + vote-emitting traceback.  Output layout is
    identical to :func:`haslr_tpu.kernels.nw_pallas.nw_votes_pallas`:
    ``planes`` (B, 3*D + 256) uint8, ``stats`` (B, 128) int32 — consumed
    unchanged by ``consensus_dense._kernel_vote_tables``."""
    B = reads.shape[0]
    G, group_rmax = _group_and_rmax(B, R, D, W, r_lens)
    base = _base_padded(R, D, W)
    DQ = D + 128
    kernel = functools.partial(
        _votes_kernel, R=R, D=D, W=W, match=match, mismatch=mismatch,
        gap=gap, GROUP=G,
    )
    rpad, dpad = _pad_inputs(reads, drafts, W)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B // G,),
            in_specs=[
                pl.BlockSpec((G, R + 2 * W), lambda i, *_: (i, 0)),
                pl.BlockSpec((G, D + 2 * W), lambda i, *_: (i, 0)),
                pl.BlockSpec((G, 1), lambda i, *_: (i, 0)),
                pl.BlockSpec((G, 1), lambda i, *_: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((G, D + 2 * DQ), lambda i, *_: (i, 0)),
                pl.BlockSpec((G, 128), lambda i, *_: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((R + 1, G, W), jnp.uint8),
                pltpu.VMEM((G, D + 2 * W), jnp.int8),
                pltpu.VMEM((G, D + 2 * W), jnp.int8),
                pltpu.VMEM((G, D + 2 * W), jnp.int8),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, D + 2 * DQ), jnp.uint8),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
        ],
        interpret=interpret,
    )(
        base,
        group_rmax,
        rpad,
        dpad,
        r_lens.astype(jnp.int32).reshape(B, 1),
        d_lens.astype(jnp.int32).reshape(B, 1),
    )
