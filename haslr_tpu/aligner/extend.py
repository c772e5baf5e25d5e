"""Base-level extension: turn an anchor chain into a full CIGAR.

Between consecutive exact-match anchors, diagonal stretches become M runs;
off-diagonal gaps are filled with a global NW alignment (vectorized numpy
rows with the closed-form insertion scan, same trick as the POA engine).
The result is a PAF-ready (ops, lens) CIGAR over the span from the first
to the last anchor, plus match statistics for the PAF n_match column.
"""

from __future__ import annotations

import numpy as np

from haslr_tpu.core import cigar as ccigar

NEG = -(10**9)


def nw_cigar(a: np.ndarray, b: np.ndarray, match=2, mismatch=-4, gap=-2):
    """Global alignment of two code arrays; returns (ops, lens, n_eq).

    ``a`` plays the query (I consumes a), ``b`` the target (D consumes b).
    """
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return np.zeros(0, np.uint8), np.zeros(0, np.int64), 0
    if la == 0:
        return (np.array([ccigar.D], np.uint8), np.array([lb], np.int64), 0)
    if lb == 0:
        return (np.array([ccigar.I], np.uint8), np.array([la], np.int64), 0)
    jj = np.arange(lb + 1, dtype=np.int64)
    H = np.empty((la + 1, lb + 1), dtype=np.int64)
    H[0] = gap * jj
    for i in range(1, la + 1):
        sub = np.where(b == a[i - 1], match, mismatch)
        tmp = np.empty(lb + 1, dtype=np.int64)
        tmp[0] = H[i - 1][0] + gap
        tmp[1:] = np.maximum(H[i - 1][:-1] + sub, H[i - 1][1:] + gap)
        H[i] = gap * jj + np.maximum.accumulate(tmp - gap * jj)
    # traceback
    ops = []
    i, j = la, lb
    n_eq = 0
    while i > 0 or j > 0:
        h = H[i][j]
        if i > 0 and j > 0 and h == H[i - 1][j - 1] + (
            match if a[i - 1] == b[j - 1] else mismatch
        ):
            ops.append(ccigar.M)
            n_eq += int(a[i - 1] == b[j - 1])
            i -= 1
            j -= 1
        elif i > 0 and h == H[i - 1][j] + gap:
            ops.append(ccigar.I)
            i -= 1
        else:
            ops.append(ccigar.D)
            j -= 1
    ops.reverse()
    o, l = ccigar.normalize(
        np.array(ops, dtype=np.uint8),
        np.ones(len(ops), dtype=np.int64),
    )
    return o, l, n_eq


def chain_to_cigar(
    q_codes: np.ndarray,
    t_codes: np.ndarray,
    q_anchor: np.ndarray,
    t_anchor: np.ndarray,
    k: int,
    exact_anchors: bool = True,
):
    """CIGAR over [q_anchor[0], q_anchor[-1]+k) x [t_anchor[0], ...+k).

    ``exact_anchors=True``: anchors are exact k-base matches in original
    coordinates (plain minimizers) — diagonal stretches become M runs and
    only off-diagonal gaps are NW-aligned.  ``False``: anchors match only
    in homopolymer-compressed space (the pacbio ``-H`` preset), so their
    original-coordinate spans differ between query and target; anchors are
    treated as chain guide *points* and every segment, anchors included,
    goes through NW.

    Returns (ops, lens, n_match) where n_match counts equal-base columns
    (the PAF col-10 statistic).
    """
    ops_list = []
    lens_list = []
    n_match = 0
    cq, ct = int(q_anchor[0]), int(t_anchor[0])

    def emit(o, l):
        ops_list.append(o)
        lens_list.append(l)

    for q2, t2 in zip(q_anchor[1:], t_anchor[1:]):
        q2, t2 = int(q2), int(t2)
        dq, dt = q2 - cq, t2 - ct
        if dq <= 0 or dt <= 0:
            continue  # dominated anchor
        if dq == dt and exact_anchors:
            emit(
                np.array([ccigar.M], np.uint8),
                np.array([dq], np.int64),
            )
            n_match += int(
                np.sum(q_codes[cq : cq + dq] == t_codes[ct : ct + dq])
            )
            cq, ct = q2, t2
        elif exact_anchors:
            if dq < k or dt < k:
                continue  # overlap inconsistent with an indel; skip anchor
            emit(
                np.array([ccigar.M], np.uint8),
                np.array([k], np.int64),
            )
            n_match += k
            o, l, ne = nw_cigar(
                q_codes[cq + k : q2], t_codes[ct + k : t2]
            )
            emit(o, l)
            n_match += ne
            cq, ct = q2, t2
        else:
            o, l, ne = nw_cigar(q_codes[cq:q2], t_codes[ct:t2])
            emit(o, l)
            n_match += ne
            cq, ct = q2, t2
    # the final anchor's k compressed bases span >= k original bases; NW the
    # k-base tail so both coordinates stay cigar-consistent
    if exact_anchors:
        emit(np.array([ccigar.M], np.uint8), np.array([k], np.int64))
        n_match += int(
            np.sum(q_codes[cq : cq + k] == t_codes[ct : ct + k])
        )
    else:
        qe = min(cq + k, len(q_codes))
        te = min(ct + k, len(t_codes))
        o, l, ne = nw_cigar(q_codes[cq:qe], t_codes[ct:te])
        emit(o, l)
        n_match += ne
    ops = np.concatenate(ops_list)
    lens = np.concatenate(lens_list)
    return ccigar.normalize(ops, lens) + (n_match,)
