"""Row-scan NW engine: XLA fallback vs Pallas (interpret) bit-equality,
cross-check against the wavefront oracle, and engine-flip consistency of
the consensus pipeline."""

import numpy as np
import pytest

import jax.numpy as jnp

from haslr_tpu.kernels import nw
from haslr_tpu.kernels import nw_rowscan as rs


def _mutated_batch(rng, B, S, sub=0.04, ins=0.03, dele=0.03, pad_rows=4):
    """Reads mutated from their drafts; last ``pad_rows`` rows stay pure
    padding (r_len = d_len = 0)."""
    reads = np.full((B, S), 4, np.uint8)
    drafts = np.full((B, S), 4, np.uint8)
    r_lens = np.zeros(B, np.int32)
    d_lens = np.zeros(B, np.int32)
    for b in range(B - pad_rows):
        dl = int(rng.integers(50, S - 10))
        d = rng.integers(0, 4, dl).astype(np.uint8)
        r = []
        for ch in d:
            x = rng.random()
            if x < dele:
                continue
            if x < dele + ins:
                r.append(int(rng.integers(0, 4)))
            if x < dele + ins + sub:
                r.append(int(rng.integers(0, 4)))
                continue
            r.append(int(ch))
        r = np.array(r[:S], np.uint8)
        reads[b, : len(r)] = r
        drafts[b, :dl] = d
        r_lens[b] = len(r)
        d_lens[b] = dl
    return reads, r_lens, drafts, d_lens


def test_row_bases_monotone_unit_steps():
    for S in (128, 256, 512, 1024):
        b = rs.row_bases(S, S, 128)
        assert b[0] == 0
        d = np.diff(b)
        assert ((d == 0) | (d == 1)).all()
        assert b[-1] == S - 128 + 1
        assert rs.rowscan_supported(S, S, 128)


def test_rowscan_xla_matches_wavefront_oracle():
    """On moderate-drift alignments (every read the admission gate
    accepts, with real indel noise) the narrower row band contains the
    optimal path, so the row-scan mapping equals the wavefront's."""
    B, S, W = 32, 256, 128
    rng = np.random.default_rng(3)
    reads, r_lens, drafts, d_lens = _mutated_batch(rng, B, S)
    # keep every read inside the admission gate
    for b in range(B):
        if abs(int(r_lens[b]) - int(d_lens[b])) >= W // 2 - 4:
            r_lens[b] = d_lens[b]
    args = (
        jnp.asarray(reads), jnp.asarray(r_lens),
        jnp.asarray(drafts), jnp.asarray(d_lens),
    )
    wf = np.asarray(
        nw._align_mapping(*args, S, S, W, 5, -4, -8, False, "wavefront")
    )
    rsm = np.asarray(
        nw._align_mapping(*args, S, S, W, 5, -4, -8, False, "rowscan")
    )
    np.testing.assert_array_equal(wf, rsm)


def test_rowscan_alignment_semantics():
    """Canonical single-pair cases through the row-scan XLA path."""
    from haslr_tpu.core import seq as cseq

    def align(read, draft, S=128, W=128):
        reads = np.full((1, S), 4, np.uint8)
        drafts = np.full((1, S), 4, np.uint8)
        reads[0, : len(read)] = cseq.encode(read)
        drafts[0, : len(draft)] = cseq.encode(draft)
        m = np.asarray(
            nw._align_mapping(
                jnp.asarray(reads), jnp.asarray([len(read)], np.int32),
                jnp.asarray(drafts), jnp.asarray([len(draft)], np.int32),
                S, S, W, 5, -4, -8, False, "rowscan",
            )
        )
        return m[0, : len(read)]

    s = "ACGTACGTTGCA" * 4
    np.testing.assert_array_equal(align(s, s), np.arange(len(s)))

    draft = "ACGTACGTACGTACGT"
    read = "ACGTACGAACGTACGT"  # one substitution
    np.testing.assert_array_equal(align(read, draft), np.arange(len(read)))

    draft = "AACCGGTTAACCGGTT"
    read = "AACCGGTAACCGGTT"  # one deletion in the read
    m = align(read, draft)
    aligned = m[m >= 0]
    assert (np.diff(aligned) >= 1).all()
    assert set(np.diff(aligned)) == {1, 2}

    draft = "AACCGGTTAACCGGTT"
    read = "AACCGGTTTAACCGGTT"  # one inserted T
    m = align(read, draft)
    ins = m[m <= -2]
    assert len(ins) == 1
    anchor = -int(ins[0]) - 3
    assert 4 <= anchor <= 8  # any anchor in the homopolymer context


def test_rowscan_pallas_mapping_matches_xla_interpret():
    """The fused Pallas row-scan kernel reproduces the XLA row-scan
    mapping bit-exactly — including out-of-gate reads (garbage rows are
    deterministic in both implementations) and pure padding rows."""
    B, S, W = 64, 256, 128
    rng = np.random.default_rng(7)
    reads, r_lens, drafts, d_lens = _mutated_batch(rng, B, S)
    # force a few out-of-gate rows (band-incompatible lengths)
    r_lens[0] = min(int(r_lens[0]), 60)
    d_lens[0] = 200
    r_lens[1] = 200
    d_lens[1] = 60
    args = (
        jnp.asarray(reads), jnp.asarray(r_lens),
        jnp.asarray(drafts), jnp.asarray(d_lens),
    )
    ref = np.asarray(
        nw._align_mapping(*args, S, S, W, 5, -4, -8, False, "rowscan")
    )
    got = np.asarray(
        rs.rowscan_mapping_pallas(*args, S, S, W, 5, -4, -8, True)
    ).astype(ref.dtype)
    np.testing.assert_array_equal(ref, got)


def test_rowscan_votes_kernel_tables_match_scatter_interpret():
    """Row-scan vote-plane kernel + MXU reduction == row-scan mapping +
    XLA scatter vote tables (base counts, both insertion ranks, coverage
    spans, read counts)."""
    from haslr_tpu.kernels import consensus_dense as cd

    B, S, W = 64, 256, 128
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
    for b in range(B - 4):
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
    mapping = nw._align_mapping(*args, S, S, W, 5, -4, -8, False, "rowscan")
    ref = cd._scatter_votes(
        mapping, jnp.asarray(reads), jnp.asarray(r_lens),
        jnp.asarray(win_idx), jnp.asarray(ok), N, S,
    )
    planes, stats = rs.rowscan_votes_pallas(*args, S, S, W, 5, -4, -8, True)
    got = cd._kernel_vote_tables(
        planes, stats, jnp.asarray(win_idx), jnp.asarray(ok), N, S
    )
    names = ("counts", "cov_diff", "ins1", "ins2", "n_reads")
    for name, a, b in zip(names, ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), name)


def test_cigar_runs_match_mapping_conversion():
    """The device CIGAR-run traceback, decoded, equals the mapping ->
    CIGAR conversion (ops, lens, n_eq) for every read — the contract the
    aligner's extension stage relies on."""
    from haslr_tpu.aligner.extend import _decode_runs_py, mapping_to_cigar
    from haslr_tpu import native as hx

    B, S, W = 64, 256, 128
    rng = np.random.default_rng(17)
    reads, r_lens, drafts, d_lens = _mutated_batch(
        rng, B, S, sub=0.05, ins=0.04, dele=0.04
    )
    args = (
        jnp.asarray(reads), jnp.asarray(r_lens),
        jnp.asarray(drafts), jnp.asarray(d_lens),
    )
    MAXR = 128
    mapping = np.asarray(
        nw._align_mapping(*args, S, S, W, 2, -4, -2, False, "rowscan")
    )
    runs, n_runs = rs._rowscan_cigar_inner(*args, S, S, W, 2, -4, -2, MAXR)
    runs = np.asarray(runs).astype(np.uint16)
    n_runs = np.asarray(n_runs)
    assert (n_runs[: B - 4] > 0).all()
    assert (n_runs <= MAXR).all()

    native_rows = hx.runs_cigars_native(
        runs, n_runs, reads, drafts, r_lens, d_lens
    )
    for b in range(B):
        q = reads[b, : r_lens[b]]
        t = drafts[b, : d_lens[b]]
        exp_o, exp_l, exp_ne = mapping_to_cigar(mapping[b], q, t)
        got_o, got_l, got_ne = _decode_runs_py(runs[b], int(n_runs[b]), q, t)
        np.testing.assert_array_equal(exp_o, got_o)
        np.testing.assert_array_equal(exp_l, got_l)
        assert exp_ne == got_ne
        if native_rows is not None:
            no, nl, nne = native_rows[b]
            np.testing.assert_array_equal(exp_o, no)
            np.testing.assert_array_equal(exp_l, nl.astype(exp_l.dtype))
            assert exp_ne == nne


def test_cigar_runs_pallas_matches_xla_interpret():
    B, S, W = 64, 256, 128
    rng = np.random.default_rng(19)
    reads, r_lens, drafts, d_lens = _mutated_batch(rng, B, S)
    args = (
        jnp.asarray(reads), jnp.asarray(r_lens),
        jnp.asarray(drafts), jnp.asarray(d_lens),
    )
    MAXR = 128
    runs_x, n_x = rs._rowscan_cigar_inner(*args, S, S, W, 2, -4, -2, MAXR)
    runs_p, cnt_p = rs.rowscan_cigar_pallas(
        *args, S, S, W, 2, -4, -2, MAXR, True
    )
    n_x = np.asarray(n_x)
    np.testing.assert_array_equal(n_x, np.asarray(cnt_p)[:, 0])
    # compare only the emitted slots (the rest is scratch garbage)
    runs_x = np.asarray(runs_x)
    runs_p = np.asarray(runs_p)
    lane = np.arange(MAXR)[None, :]
    m = lane < np.minimum(n_x, MAXR)[:, None]
    np.testing.assert_array_equal(runs_x[m], runs_p[m])


def test_cigar_runs_overflow_flagged():
    """Reads with more runs than MAXR must report their true count (the
    caller falls back to a host alignment, never a truncated CIGAR)."""
    B, S, W = 32, 256, 128
    rng = np.random.default_rng(23)
    # indel-dense reads: an insertion after every other base => ~1.5
    # runs per draft base, far past a small MAXR
    drafts = np.full((B, S), 4, np.uint8)
    reads = np.full((B, S), 4, np.uint8)
    r_lens = np.zeros(B, np.int32)
    d_lens = np.zeros(B, np.int32)
    for b in range(B):
        dl = 150
        d = rng.integers(0, 4, dl).astype(np.uint8)
        r = []
        for p, ch in enumerate(d):
            r.append(int(ch))
            if p % 2 == 0 and p < 80:
                r.append(int(rng.integers(0, 4)))
        r = np.array(r, np.uint8)
        reads[b, : len(r)] = r
        drafts[b, :dl] = d
        r_lens[b] = len(r)
        d_lens[b] = dl
    MAXR = 64  # < the ~80 runs these reads need
    runs, n_runs = rs._rowscan_cigar_inner(
        jnp.asarray(reads), jnp.asarray(r_lens),
        jnp.asarray(drafts), jnp.asarray(d_lens),
        S, S, W, 2, -4, -2, MAXR,
    )
    n_runs = np.asarray(n_runs)
    from haslr_tpu.aligner.extend import _decode_runs_py

    runs = np.asarray(runs).astype(np.uint16)
    for b in range(B):
        if n_runs[b] > MAXR:
            _, _, ne = _decode_runs_py(
                runs[b], int(n_runs[b]),
                reads[b, : r_lens[b]], drafts[b, : d_lens[b]],
            )
            assert ne == -1
    assert (n_runs > MAXR).any()


def test_batch_align_segments_runs_path():
    """End-to-end: the aligner's batched extension through the CIGAR-run
    device path consumes both sequences exactly and matches the host
    banded NW on clean segments."""
    from haslr_tpu.aligner.extend import batch_align_segments, nw_cigar
    from haslr_tpu.core import cigar as ccigar

    rng = np.random.default_rng(31)
    segments = []
    for _ in range(40):
        L = int(rng.integers(20, 400))
        t = rng.integers(0, 4, L).astype(np.uint8)
        q = []
        for ch in t:
            x = rng.random()
            if x < 0.03:
                continue
            if x < 0.06:
                q.append(int(rng.integers(0, 4)))
            q.append(int(ch))
        segments.append((np.array(q, np.uint8), t))
    out = batch_align_segments(segments)
    for (q, t), (o, l, ne) in zip(segments, out):
        qc = int(np.sum(np.where(o != ccigar.D, l, 0)))
        tc = int(np.sum(np.where(o != ccigar.I, l, 0)))
        assert qc == len(q) and tc == len(t)
        assert 0 <= ne <= min(len(q), len(t))


def test_consensus_engines_agree():
    """The full dense consensus voted through the row-scan engine equals
    the wavefront engine's output on realistic windows (the band
    difference only matters on extreme-drift alignments the admission
    gate rejects)."""
    from haslr_tpu.kernels.consensus import batched_consensus

    rng = np.random.default_rng(23)
    bases = "ACGT"

    def mutate(s, rate=0.07):
        out = []
        for ch in s:
            r = rng.random()
            if r < rate / 3:
                continue
            if r < 2 * rate / 3:
                out.append(bases[rng.integers(0, 4)])
            else:
                out.append(ch)
                if r < rate:
                    out.append(bases[rng.integers(0, 4)])
        return "".join(out)

    windows = []
    for L in (60, 200, 500, 900):
        true = "".join(bases[i] for i in rng.integers(0, 4, L))
        windows.append([mutate(true) for _ in range(9)])
    windows.append([])
    windows.append(["ACGT"])

    old = nw.ENGINE
    try:
        nw.ENGINE = "rowscan"
        out_rs = batched_consensus(windows)
        nw.ENGINE = "wavefront"
        out_wf = batched_consensus(windows)
    finally:
        nw.ENGINE = old
    assert out_rs == out_wf
