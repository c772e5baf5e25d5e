"""Batched window consensus: align-to-draft + weighted pileup vote.

The device-batched replacement for per-window SPOA (reference
``Assemble.cpp:479-560``).  For each backbone edge's window:

1. pick a draft = the median-length supporting subsequence;
2. length-bucket all (read, draft) pairs across *all* windows and run the
   batched banded-NW kernel (:mod:`haslr_tpu.kernels.nw`) per bucket — the
   TPU sees a few large ``(B, W)`` lockstep DPs instead of thousands of
   tiny irregular ones;
3. lockstep traceback + insertion-aware pileup vote (numpy, vectorized over
   the batch) → polished consensus;
4. repeat with the polished sequence as the new draft (``rounds`` times).

Majority voting across ~``edge_supp`` reads yields window accuracy
comparable to POA; ties keep the draft base.  Reads whose length differs
from the draft's by more than ~W/2 cannot be banded and are skipped (they
are chimeric/clipped outliers in practice).
"""

from __future__ import annotations

import numpy as np

from haslr_tpu.core import seq as cseq
from haslr_tpu.kernels import nw

BUCKETS = (128, 256, 512, 1024, 2048, 4096, 8192, 16384)


def _bucket_size(n: int) -> int:
    for b in BUCKETS:
        if n <= b:
            return b
    return BUCKETS[-1]


def _band_width(S: int) -> int:
    if S <= 1024:
        return 128
    if S <= 2048:
        return 256
    return 512


def _pileup_consensus(
    draft_codes: np.ndarray,
    read_codes: list[np.ndarray],
    mappings: list[np.ndarray],
) -> np.ndarray:
    """Vote a consensus from per-read draft-position mappings."""
    D = len(draft_codes)
    counts = np.zeros((D, 4), dtype=np.int32)
    cov = np.zeros(D + 1, dtype=np.int32)
    ins1 = np.zeros((D + 1, 4), dtype=np.int32)  # index a+1: after draft a
    ins2 = np.zeros((D + 1, 4), dtype=np.int32)
    n_reads = 0
    for codes, m in zip(read_codes, mappings):
        L = len(codes)
        mm = m[:L]
        aligned = mm >= 0
        if not aligned.any():
            continue
        n_reads += 1
        pos = mm[aligned]
        np.add.at(counts, (pos, codes[aligned]), 1)
        jmin, jmax = pos.min(), pos.max()
        cov[jmin] += 1
        cov[jmax + 1] -= 1
        # insertions: anchor a = -m - 3; rank within each run
        ins = mm <= -2
        if ins.any():
            anchors = -mm - 3
            idx = np.arange(L)
            start = ins & np.concatenate(
                [[True], (~ins[:-1]) | (anchors[1:] != anchors[:-1])]
            )
            last_start = np.maximum.accumulate(np.where(start, idx, -1))
            rank = idx - last_start
            sel1 = ins & (rank == 0)
            sel2 = ins & (rank == 1)
            np.add.at(ins1, (anchors[sel1] + 1, codes[sel1]), 1)
            np.add.at(ins2, (anchors[sel2] + 1, codes[sel2]), 1)
    if n_reads == 0:
        return draft_codes
    coverage = np.cumsum(cov[:-1])
    base_sum = counts.sum(axis=1)
    base_best = counts.argmax(axis=1)
    base_best_cnt = counts[np.arange(D), base_best]
    # prefer the draft base on ties
    draft_cnt = counts[np.arange(D), draft_codes]
    keep_draft = draft_cnt == base_best_cnt
    base_call = np.where(keep_draft, draft_codes, base_best)
    del_votes = coverage - base_sum
    emit_base = base_best_cnt > del_votes

    ins1_sum = ins1.sum(axis=1)
    ins2_sum = ins2.sum(axis=1)
    cov_at = np.concatenate([coverage[:1], coverage])  # cov before pos p
    emit_ins1 = ins1_sum * 2 > np.maximum(cov_at, 1)
    emit_ins2 = ins2_sum * 2 > np.maximum(cov_at, 1)
    ins1_best = ins1.argmax(axis=1)
    ins2_best = ins2.argmax(axis=1)

    out = []
    if emit_ins1[0]:
        out.append(ins1_best[0])
        if emit_ins2[0]:
            out.append(ins2_best[0])
    for p in range(D):
        if emit_base[p]:
            out.append(base_call[p])
        if emit_ins1[p + 1]:
            out.append(ins1_best[p + 1])
            if emit_ins2[p + 1]:
                out.append(ins2_best[p + 1])
    return np.array(out, dtype=np.uint8)


def _one_round(window_codes, drafts, match, mismatch, gap):
    """One align+vote polish round for all windows; returns new drafts."""
    # bucket (win, read) pairs
    jobs = {}  # (S) -> list of (win_idx, read_idx)
    for wi, (codes_list, draft) in enumerate(zip(window_codes, drafts)):
        if len(codes_list) <= 1 or len(draft) == 0:
            continue
        # bucket on the draft length alone: band-incompatible outlier reads
        # (e.g. whole-suffix artifacts) are dropped, not allowed to inflate
        # the padded problem size for the whole window
        S0 = _bucket_size(len(draft))
        W = _band_width(S0)
        S = _bucket_size(len(draft) + W // 2)
        W = _band_width(S)
        for ri, c in enumerate(codes_list):
            if abs(len(c) - len(draft)) >= W // 2 - 4:
                continue  # cannot band; outlier
            if len(c) == 0 or len(c) > S:
                continue
            jobs.setdefault(S, []).append((wi, ri))
    per_window_maps = [dict() for _ in window_codes]
    for S, pairs in sorted(jobs.items()):
        W = _band_width(S)
        # cap batch so the direction tensor stays modest (< ~512 MB)
        max_b = max(1, (512 << 20) // ((2 * S + 1) * W))
        for lo in range(0, len(pairs), max_b):
            chunk = pairs[lo : lo + max_b]
            # pad the batch to a power of two (>= 32: the Pallas DP kernel
            # groups 32 reads per program) so jit shapes stay stable
            B = 32
            while B < len(chunk):
                B *= 2
            reads = np.full((B, S), 4, dtype=np.uint8)
            dr = np.full((B, S), 4, dtype=np.uint8)
            r_lens = np.zeros(B, dtype=np.int32)
            d_lens = np.zeros(B, dtype=np.int32)
            for k, (wi, ri) in enumerate(chunk):
                c = window_codes[wi][ri]
                d = drafts[wi]
                reads[k, : len(c)] = c
                dr[k, : len(d)] = d
                r_lens[k] = len(c)
                d_lens[k] = len(d)
            # device-resident DP + traceback: only the compact (B, S)
            # mapping crosses the (slow) device->host link
            mapping = nw.align_mapping_device(
                reads, r_lens, dr, d_lens, W, match, mismatch, gap
            )
            for k, (wi, ri) in enumerate(chunk):
                per_window_maps[wi][ri] = mapping[k]
    new_drafts = []
    for wi, (codes_list, draft) in enumerate(zip(window_codes, drafts)):
        maps = per_window_maps[wi]
        if not maps:
            new_drafts.append(draft)
            continue
        read_codes = [codes_list[ri] for ri in sorted(maps)]
        mappings = [maps[ri] for ri in sorted(maps)]
        new_drafts.append(_pileup_consensus(draft, read_codes, mappings))
    return new_drafts


def batched_consensus(
    windows: list[list[str]],
    match: int = 5,
    mismatch: int = -4,
    gap: int = -8,
    rounds: int = 2,
) -> list[str]:
    """Consensus string per window (list of supporting subsequences)."""
    window_codes = []
    drafts = []
    for seqs in windows:
        codes = [cseq.encode(s) for s in seqs if len(s) > 0]
        window_codes.append(codes)
        if not codes:
            drafts.append(np.zeros(0, dtype=np.uint8))
        else:
            by_len = sorted(codes, key=len)
            drafts.append(by_len[len(by_len) // 2])
    for _ in range(rounds):
        drafts = _one_round(window_codes, drafts, match, mismatch, gap)
    return [cseq.decode(d) for d in drafts]
