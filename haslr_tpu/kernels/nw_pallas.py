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
GROUP = 32  # minimum reads per grid program (int8 sublane tile: 32)
# per-program VMEM budget for the direction scratch (v5e VMEM is ~16 MB;
# leave room for the double-buffered input blocks)
DIRS_VMEM_BUDGET = 10 << 20
# debug switch (trace time): skip the in-kernel traceback to measure the
# DP phase alone — the mapping output is then meaningless
TB_SKIP = False
# unroll factors for the DP / traceback fori loops (trace-time): >1
# amortizes Mosaic's per-iteration control overhead over several
# anti-diagonals at the cost of code size
DP_UNROLL = 1
TB_UNROLL = 1


def group_for(R: int, D: int, W: int) -> int:
    """Reads per grid program: 64 when the direction scratch fits VMEM
    (measured 1.6x faster than 32 — the per-step scalar/control overhead
    amortizes over twice the rows), else 32."""
    return 64 if (R + D + 1) * 64 * W <= DIRS_VMEM_BUDGET else 32


def _rev_pad_inputs(reads, drafts, W):
    """Device-side prep for the slice-window DP: reads reversed along the
    base axis and padded to R + 2W, drafts padded to D + 2W (int32 lanes —
    int8/int16 inputs hit Mosaic tiling limits)."""
    pad = ((0, 0), (0, 2 * W))
    rrev = jnp.pad(
        jnp.flip(reads.astype(jnp.int32), axis=1), pad, constant_values=4
    )
    dpad = jnp.pad(drafts.astype(jnp.int32), pad, constant_values=4)
    return rrev, dpad


def _dp_phase(base_ref, rrev_ref, dpad_ref, rl, dl, dirs_ref, t_hi,
              *, R, D, W, match, mismatch, gap, GROUP):
    """Run the banded DP up to anti-diagonal ``t_hi`` (inclusive), writing
    direction rows to ``dirs_ref`` (HBM output block or VMEM scratch).

    ``rrev_ref``: the reads REVERSED along the base axis and padded to
    ``R + 2W`` (``rrev[p] = reads[R-1-p]``); ``dpad_ref``: drafts padded to
    ``D + 2W``.  With the band base moving by {0, 1} per step, the read and
    draft bases under the band are *contiguous slices* of these arrays
    (reads descend along the band, hence the reversal) — each step fetches
    its whole (GROUP, W) base window with one 128-aligned wide load plus
    one dynamic lane roll, instead of maintaining incrementally-shifted
    window carries.  Lanes whose slice index falls outside the real
    sequence read padding/garbage; every such lane is an invalid DP cell
    (``i``/``j`` out of range) and is masked to NEG regardless.
    """
    # int16 DP lanes would halve the VPU tile count wherever the scores
    # provably fit (|real score| <= |gap|*(R+D), sentinel -20000), and the
    # code below is written dtype-generic for it — but the v5e Mosaic
    # target rejects every 16-bit building block tried on hardware:
    # tpu.dynamic_rotate (32-bit only), tpu.iota ("16-bit iota not
    # supported"), and arith.cmpi on vector<..xi16> ("Target does not
    # support this comparison").  Keep int32 until the toolchain grows
    # 16-bit lanes; flipping use16 back on is the only change needed.
    use16 = False
    sdt = jnp.int16 if use16 else jnp.int32
    neg = jnp.asarray(-20000 if use16 else NEG, sdt)
    inf = jnp.asarray(20000 if use16 else -NEG, sdt)
    lane = jax.lax.broadcasted_iota(jnp.int32, (GROUP, W), 1)
    # 16-bit iota is not supported by the hardware; cast a 32-bit one
    lane_s = lane.astype(sdt)
    WIDE = 2 * W
    # roll-edge caps: stored scores are >= neg, so a min() against neg at
    # the wrapped lane pins it exactly (and inf elsewhere is a no-op)
    cap_first = jnp.where(lane_s == 0, neg, inf)
    cap_last = jnp.where(lane_s == W - 1, neg, inf)

    # Loop-carry inits must carry the natural {0,0} vector layout of the
    # loop-body outputs; constant (or constant-folded) inits get replicated
    # layouts and Mosaic cannot relayout non-replicated -> replicated at
    # the loop back-edge.  min(codes, 0) == 0 for 2-bit code data but is
    # not foldable, pinning each init to a distinct data-dependent value.
    anchor_r = jnp.minimum(rrev_ref[:, 0:W], 0).astype(sdt)
    anchor_d = jnp.minimum(dpad_ref[:, 0:W], 0).astype(sdt)
    h_init = jnp.full((GROUP, W), neg, sdt) + anchor_r
    h0 = jnp.where(lane_s == 0, jnp.asarray(0, sdt), h_init) + anchor_d
    dirs_ref[0] = jnp.zeros((GROUP, W), jnp.uint8)
    rl_s = rl.astype(sdt)
    dl_s = dl.astype(sdt)

    def window(ref, o, size):
        """(GROUP, W) with out[:, k] = ref[:, o + k] wherever o + k lands in
        [aligned, aligned + 2W) — true for every lane belonging to a valid
        DP cell; other lanes hold wrapped garbage."""
        aligned = jnp.clip((o // 128) * 128, 0, (size // 128) * 128)
        aligned = pl.multiple_of(aligned, 128)
        wide = ref[:, pl.ds(aligned, WIDE)]
        shift = jnp.mod(aligned - o, WIDE)
        return pltpu.roll(wide, shift, axis=1)[:, :W]

    def rot1l(x):
        """out[:, k] = x[:, k+1 mod W].  tpu.dynamic_rotate handles only
        32-bit lanes; int16 falls back to slice+concat."""
        if use16:
            return jnp.concatenate([x[:, 1:], x[:, :1]], axis=1)
        return pltpu.roll(x, W - 1, axis=1)

    def rot1r(x):
        """out[:, k] = x[:, k-1 mod W]."""
        if use16:
            return jnp.concatenate([x[:, -1:], x[:, :-1]], axis=1)
        return pltpu.roll(x, 1, axis=1)

    def step(t, carry):
        h_prev2, h_prev1 = carry
        b_t = base_ref[t]
        s1 = b_t - base_ref[t - 1]
        s2 = b_t - base_ref[t - 2]
        # base windows: rb[k] = reads[i-1] = rrev[R - t + b_t + k],
        # db[k] = drafts[j-1] = drafts[b_t - 1 + k]
        rb = window(rrev_ref, R - t + b_t, R)
        db = window(dpad_ref, b_t - 1, D)
        # neighbors: up = h1[k+s1], left = h1[k+s1-1], diag = h2[k+s2-1]
        # with s1 in {0,1} and s2 in {0,1,2} — one lane shift each way
        h1r = jnp.minimum(rot1l(h_prev1), cap_last)
        h1l = jnp.minimum(rot1r(h_prev1), cap_first)
        up = jnp.where(s1 == 1, h1r, h_prev1)
        left = jnp.where(s1 == 1, h_prev1, h1l)
        h2r = jnp.minimum(rot1l(h_prev2), cap_last)
        h2l = jnp.minimum(rot1r(h_prev2), cap_first)
        diag = jnp.where(s2 == 2, h2r, jnp.where(s2 == 0, h2l, h_prev2))
        # int32 compare + select, then a plain cast (no mask relayout)
        sub = jnp.where(rb == db, match, mismatch).astype(sdt)
        # candidates UNmasked: an out-of-range neighbor always carries the
        # neg sentinel (invalid cells are clamped below), so neg+gap/sub
        # can never win the max at any cell the traceback visits, and ties
        # between real candidates are unaffected
        cand_d = diag + sub
        cand_u = up + jnp.asarray(gap, sdt)
        cand_l = left + jnp.asarray(gap, sdt)
        h = jnp.maximum(cand_d, jnp.maximum(cand_u, cand_l))
        d = jnp.where(
            h == cand_d,
            jnp.asarray(DIAG, sdt),
            jnp.where(
                h == cand_u, jnp.asarray(UP, sdt), jnp.asarray(LEFT, sdt)
            ),
        )
        # validity folded to lane-range form: with j = b_t + lane and
        # i = t - j, the three bounds (i >= 0, i <= rl, j <= dl) are
        # exactly  t - rl - b_t <= lane <= min(t, dl) - b_t  — two
        # (G, W) compares against (G, 1) bounds instead of two iota
        # arithmetics + three compares
        t_s = jnp.asarray(t, sdt)
        b_s = jnp.asarray(b_t, sdt)
        lane_lo = (t_s - b_s) - rl_s
        lane_hi = jnp.minimum(t_s, dl_s) - b_s
        valid = (lane_s >= lane_lo) & (lane_s <= lane_hi)
        h = jnp.where(valid, h, neg)
        dirs_ref[t] = d.astype(jnp.uint8)
        return h_prev1, h

    jax.lax.fori_loop(
        1, t_hi + 1, step, (h_init, h0),
        unroll=DP_UNROLL if DP_UNROLL > 1 else False,
    )


def _kernel(base_ref, rrev_ref, dpad_ref, rlen_ref, dlen_ref, dirs_ref,
            *, R, D, W, match, mismatch, gap, GROUP):
    _dp_phase(base_ref, rrev_ref, dpad_ref, rlen_ref[:], dlen_ref[:],
              dirs_ref, R + D, R=R, D=D, W=W, match=match,
              mismatch=mismatch, gap=gap, GROUP=GROUP)


def _fused_kernel(base_ref, tmax_ref, rrev_ref, dpad_ref, rlen_ref,
                  dlen_ref, map_ref, dirs_vmem, *, R, D, W, match, mismatch,
                  gap, GROUP):
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
    _dp_phase(base_ref, rrev_ref, dpad_ref, rl, dl, dirs_vmem, t_max,
              R=R, D=D, W=W, match=match, mismatch=mismatch, gap=gap,
              GROUP=GROUP)

    lane_w = jax.lax.broadcasted_iota(jnp.int32, (GROUP, W), 1)
    col_r = jax.lax.broadcasted_iota(jnp.int32, (GROUP, R), 1)
    # data-dependent init (see layout note in _dp_phase)
    mapping0 = jnp.full((GROUP, R), -1, jnp.int32) + jnp.minimum(
        rrev_ref[:, 0:R], 0
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

    if TB_SKIP:
        map_ref[:] = mapping0
        return
    _, _, mapping = jax.lax.fori_loop(
        0, t_max, tb_step, (rl, dl, mapping0),
        unroll=TB_UNROLL if TB_UNROLL > 1 else False,
    )
    map_ref[:] = mapping


def _votes_kernel(base_ref, tmax_ref, rrev_ref, dpad_ref, rlen_ref,
                  dlen_ref, planes_ref, stats_ref, dirs_vmem, pb_vmem,
                  pa_vmem, pa2_vmem, *, R, D, W, match, mismatch, gap,
                  GROUP):
    """DP + traceback that emits DRAFT-INDEXED vote planes directly.

    The mapping-output kernel leaves the per-window vote aggregation to an
    XLA scatter-add over B*R elements — measured ~55 ms per 8192-read
    round on v5e (duplicate-index scatters serialize), 10-100x the cost
    of the DP itself.  This variant instead writes, during the same
    wavefront traceback, three per-READ vote planes indexed by draft
    position:

    - ``planeB[j-1]`` — the read base aligned to draft position j-1
      (diagonal moves; 4 = no base aligned there);
    - ``planeA[q]`` / ``planeA2[q]`` — the first/second inserted base
      after draft anchor q-1 (forward rank 0/1 of each insertion run;
      4 = none).

    Per-read planes have NO write collisions (a read aligns each draft
    position at most once, and each anchor hosts at most one insertion
    run per read — j strictly decreases across runs), so no scatter is
    needed anywhere: the per-window tables reduce from the planes with an
    int8 segment-matrix matmul on the MXU
    (``consensus_dense._kernel_vote_tables``).

    Insertion ranks: traceback visits a run's insertions in reverse
    order, so registers ``bA``/``bB`` shift on every UP move and hold the
    run's forward-first two bases when the run ends; the flush is eager
    (on the read's next non-continuing move), which keeps the flush
    target ``q = run_anchor + 1`` equal to the CURRENT j.

    All three write targets lie inside the step's band window
    (``j - 1`` and ``q = j`` are within ``[base_t - 1, base_t + W - 1]``
    for every row), so each plane lives in int8 VMEM scratch and is
    updated with a 2W-wide aligned read-modify-write per step instead of
    a full-width select — the full-width variant made the traceback the
    dominant cost of the whole consensus engine (~0.7 s per 65k-read
    round on v5e; plane updates were ~3/4 of its per-step vector work).

    ``stats_ref`` carries per-read (jmin, jmax) over aligned draft
    positions — the inputs for the O(B) coverage-span/read-count
    scatters that remain in XLA.
    """
    rl = rlen_ref[:]  # (GROUP, 1) int32
    dl = dlen_ref[:]
    t_max = tmax_ref[pl.program_id(0)]
    _dp_phase(base_ref, rrev_ref, dpad_ref, rl, dl, dirs_vmem, t_max,
              R=R, D=D, W=W, match=match, mismatch=mismatch, gap=gap,
              GROUP=GROUP)

    DQ = D + 128  # insertion-plane width: slots q in [0, D], lane-padded
    WIDE = 2 * W
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (GROUP, W), 1)
    lane_2w = jax.lax.broadcasted_iota(jnp.int32, (GROUP, WIDE), 1)
    none8 = jnp.full((GROUP, pb_vmem.shape[1]), 4, jnp.int8)
    pb_vmem[:] = none8[:, : pb_vmem.shape[1]]
    pa_vmem[:] = none8[:, : pa_vmem.shape[1]]
    pa2_vmem[:] = none8[:, : pa2_vmem.shape[1]]
    # data-dependent inits (see layout note in _dp_phase)
    z1 = jnp.minimum(rrev_ref[:, 0:1], 0)
    run_anchor0 = jnp.full((GROUP, 1), -9, jnp.int32) + z1
    b_a0 = jnp.full((GROUP, 1), 4, jnp.int32) + z1
    b_b0 = jnp.full((GROUP, 1), 4, jnp.int32) + z1
    jmin0 = jnp.full((GROUP, 1), jnp.int32(1 << 29), jnp.int32) + z1
    jmax0 = jnp.full((GROUP, 1), -1, jnp.int32) + z1
    cap_b = (pb_vmem.shape[1] - WIDE) // 128 * 128

    def rmw(ref, aligned, cond, p, val8):
        """ref[:, aligned + k] = val8 where k == p & cond (one aligned
        2W-wide window read-modify-write)."""
        wide = ref[:, pl.ds(aligned, WIDE)]
        wide = jnp.where(
            (lane_2w == p) & cond, val8, wide
        )
        ref[:, pl.ds(aligned, WIDE)] = wide

    def tb_step(k, carry):
        (i, j, run_anchor, b_a, b_b, jmn, jmx) = carry
        t = t_max - k
        active = ((i > 0) | (j > 0)) & (i + j == t)
        b_t = base_ref[t]
        lane = j - b_t
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
        # read base at i-1: same sliding window as the DP, one lane-select
        rbw = window_of(rrev_ref, R - t + b_t, R, W, GROUP)
        rb_i = jnp.sum(
            jnp.where(lane_w == lane, rbw, 0), axis=1, keepdims=True
        ) & 3
        rb8 = rb_i.astype(jnp.int8)
        # every write target this step sits in [b_t - 1, b_t + W - 1]:
        # one aligned window base serves all three planes
        aligned = jnp.clip((b_t - 1) // 128 * 128, 0, cap_b)
        aligned = pl.multiple_of(aligned, 128)
        # aligned-base vote at col j-1 + span stats (diagonal moves)
        rmw(pb_vmem, aligned, is_diag, j - 1 - aligned, rb8)
        jmn = jnp.where(is_diag, jnp.minimum(jmn, j - 1), jmn)
        jmx = jnp.where(is_diag, jnp.maximum(jmx, j - 1), jmx)
        # insertion runs: traceback-consecutive UP moves at one anchor;
        # eager flush => target q = run_anchor + 1 == current j
        anchor_now = j - 1
        same_run = is_up & (run_anchor == anchor_now)
        has_run = run_anchor >= -1
        ended = active & has_run & ~same_run
        q_t = run_anchor + 1
        rmw(pa_vmem, aligned, ended, q_t - aligned,
            b_a.astype(jnp.int8))
        rmw(pa2_vmem, aligned, ended, q_t - aligned,
            b_b.astype(jnp.int8))
        b_b = jnp.where(same_run, b_a, jnp.where(is_up, 4, b_b))
        b_a = jnp.where(is_up, rb_i, jnp.where(ended, 4, b_a))
        run_anchor = jnp.where(
            is_up, anchor_now, jnp.where(ended, -9, run_anchor)
        )
        i = i - (is_diag | is_up)
        j = j - (is_diag | is_left)
        return (i, j, run_anchor, b_a, b_b, jmn, jmx)

    carry = (rl, dl, run_anchor0, b_a0, b_b0, jmin0, jmax0)
    if not TB_SKIP:
        carry = jax.lax.fori_loop(0, t_max, tb_step, carry, unroll=False)
    (_, _, run_anchor, b_a, b_b, jmn, jmx) = carry
    # final flush: a run still open when the walk reaches (0, 0) has
    # anchor -1 (forced UP moves at j == 0), so the target slot is q = 0
    has_run = run_anchor >= -1
    q_t = run_anchor + 1
    aligned0 = pl.multiple_of(0, 128)
    rmw(pa_vmem, aligned0, has_run & (q_t < WIDE), q_t,
        b_a.astype(jnp.int8))
    rmw(pa2_vmem, aligned0, has_run & (q_t < WIDE), q_t,
        b_b.astype(jnp.int8))
    planes_ref[:, 0:D] = pb_vmem[:, 0:D].astype(jnp.uint8)
    planes_ref[:, D : D + DQ] = pa_vmem[:, 0:DQ].astype(jnp.uint8)
    planes_ref[:, D + DQ : D + 2 * DQ] = pa2_vmem[:, 0:DQ] \
        .astype(jnp.uint8)
    lane_s = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 128), 1)
    stats_ref[:] = jnp.where(
        lane_s == 0, jmn, jnp.where(lane_s == 1, jmx, 0)
    )


def window_of(ref, o, size, W, GROUP):
    """(GROUP, W) sliding window out[:, k] = ref[:, o + k] (module-level
    twin of ``_dp_phase``'s inner helper, for the traceback)."""
    WIDE = 2 * W
    aligned = jnp.clip((o // 128) * 128, 0, (size // 128) * 128)
    aligned = pl.multiple_of(aligned, 128)
    wide = ref[:, pl.ds(aligned, WIDE)]
    shift = jnp.mod(aligned - o, WIDE)
    return pltpu.roll(wide, shift, axis=1)[:, :W]


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10))
def nw_votes_pallas(reads, r_lens, drafts, d_lens, R, D, W, match,
                    mismatch, gap, interpret=False):
    """Fused banded-NW DP + vote-emitting traceback.

    Returns ``(planes, stats)``: ``planes`` (B, 3*D + 256) uint8 laid out
    as [aligned-base plane (D) | ins rank-0 plane (D+128) | ins rank-1
    plane (D+128)] with 4 = no vote, ``stats`` (B, 128) int32 with
    columns (jmin, jmax) over aligned draft positions (jmax < 0 = read
    aligned nowhere).  See :func:`_votes_kernel`."""
    B = reads.shape[0]
    G = group_for(R, D, W)
    if B % G:
        G = 32
    assert B % G == 0
    T = R + D
    base = jnp.asarray(band_bases(R, D, W), dtype=jnp.int32)
    rl = r_lens.astype(jnp.int32)
    dl = d_lens.astype(jnp.int32)
    group_tmax = (rl + dl).reshape(B // G, G).max(axis=1)
    group_tmax = jnp.maximum(group_tmax, 1)
    DQ = D + 128
    kernel = functools.partial(
        _votes_kernel, R=R, D=D, W=W, match=match, mismatch=mismatch,
        gap=gap, GROUP=G,
    )
    rrev, dpad = _rev_pad_inputs(reads, drafts, W)
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
                pltpu.VMEM((T + 1, G, W), jnp.uint8),
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
        group_tmax,
        rrev,
        dpad,
        rl.reshape(B, 1),
        dl.reshape(B, 1),
    )


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10))
def nw_dirs_pallas(reads, r_lens, drafts, d_lens, R, D, W, match, mismatch,
                   gap, interpret=False):
    """Direction tensor (T+1, B, W) via the Pallas kernel (B % 8 == 0).

    ``interpret=True`` runs the kernel in the Pallas interpreter (the only
    mode available on CPU; used by the test suite)."""
    B = reads.shape[0]
    G = group_for(R, D, W)
    if B % G:
        G = 32
    assert B % G == 0
    T = R + D
    base = jnp.asarray(band_bases(R, D, W), dtype=jnp.int32)
    grid = (B // G,)
    kernel = functools.partial(
        _kernel, R=R, D=D, W=W, match=match, mismatch=mismatch, gap=gap,
        GROUP=G,
    )
    rrev, dpad = _rev_pad_inputs(reads, drafts, W)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((G, R + 2 * W), lambda i, *_: (i, 0)),
                pl.BlockSpec((G, D + 2 * W), lambda i, *_: (i, 0)),
                pl.BlockSpec((G, 1), lambda i, *_: (i, 0)),
                pl.BlockSpec((G, 1), lambda i, *_: (i, 0)),
            ],
            out_specs=pl.BlockSpec(
                (T + 1, G, W), lambda i, *_: (0, i, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((T + 1, B, W), jnp.uint8),
        interpret=interpret,
    )(
        base,
        rrev,
        dpad,
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
    G = group_for(R, D, W)
    if B % G:
        G = 32
    assert B % G == 0
    T = R + D
    base = jnp.asarray(band_bases(R, D, W), dtype=jnp.int32)
    rl = r_lens.astype(jnp.int32)
    dl = d_lens.astype(jnp.int32)
    group_tmax = (rl + dl).reshape(B // G, G).max(axis=1)
    # every group runs at least one step so fori_loop bounds stay trivial
    group_tmax = jnp.maximum(group_tmax, 1)
    kernel = functools.partial(
        _fused_kernel, R=R, D=D, W=W, match=match, mismatch=mismatch,
        gap=gap, GROUP=G,
    )
    rrev, dpad = _rev_pad_inputs(reads, drafts, W)
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
                pltpu.VMEM((T + 1, G, W), jnp.uint8),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, R), jnp.int32),
        interpret=interpret,
    )(
        base,
        group_tmax,
        rrev,
        dpad,
        rl.reshape(B, 1),
        dl.reshape(B, 1),
    )
