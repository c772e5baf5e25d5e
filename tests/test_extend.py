"""Extension-layer tests: mapping->CIGAR conversion, batched segment
alignment, banded host NW."""

import numpy as np
import pytest

from haslr_tpu.aligner.extend import (
    batch_align_segments,
    mapping_to_cigar,
    nw_cigar,
)
from haslr_tpu.core import cigar as ccigar
from haslr_tpu.core import seq as cseq


def _score(o, l, a, b, match=2, mismatch=-4, gap=-2):
    i = j = 0
    sc = 0
    for op, ln in zip(o, l):
        for _ in range(int(ln)):
            if op == ccigar.M:
                sc += match if a[i] == b[j] else mismatch
                i += 1
                j += 1
            elif op == ccigar.I:
                sc += gap
                i += 1
            else:
                sc += gap
                j += 1
    assert i == len(a) and j == len(b), "cigar must consume both sequences"
    return sc


def test_mapping_to_cigar_identity():
    a = cseq.encode("ACGTACGT")
    m = np.arange(8, dtype=np.int16)
    o, l, ne = mapping_to_cigar(m, a, a)
    assert ccigar.to_string(o, l) == "8M"
    assert ne == 8


def test_mapping_to_cigar_with_gaps():
    # read ACGT aligned to target ACGGT: pos 0,1,2 diag (0,1,3): deletion of
    # target pos 2 between read pos 1 and 2
    a = cseq.encode("ACGT")
    b = cseq.encode("ACGGT")
    m = np.array([0, 1, 3, 4], dtype=np.int16)
    o, l, ne = mapping_to_cigar(m, a, b)
    assert ccigar.query_len(o, l) == 4
    assert ccigar.target_len(o, l) == 5
    assert ccigar.to_string(o, l) == "2M1D2M"


def test_mapping_to_cigar_insertion():
    # read base 2 inserted after target pos 1
    a = cseq.encode("ACTGT")
    b = cseq.encode("ACGT")
    m = np.array([0, 1, -(1 + 3), 2, 3], dtype=np.int16)
    o, l, ne = mapping_to_cigar(m, a, b)
    assert ccigar.to_string(o, l) == "2M1I2M"


def test_mapping_to_cigar_empty_cases():
    o, l, ne = mapping_to_cigar(np.zeros(0, np.int16), np.zeros(0, np.uint8),
                                cseq.encode("ACG"))
    assert ccigar.to_string(o, l) == "3D"


def test_batch_align_segments_matches_host():
    rng = np.random.default_rng(8)
    segs = []
    for _ in range(20):
        L = int(rng.integers(20, 400))
        b = rng.integers(0, 4, L).astype(np.uint8)
        a = b.copy()
        nmut = max(1, L // 20)
        pos = rng.integers(0, L, nmut)
        a[pos] = (a[pos] + 1) % 4
        segs.append((a, b))
    # include degenerate segments
    segs.append((np.zeros(0, np.uint8), cseq.encode("ACGT")))
    segs.append((cseq.encode("ACGT"), np.zeros(0, np.uint8)))
    results = batch_align_segments(segs)
    for (a, b), (o, l, ne) in zip(segs, results):
        # cigar consumes both sequences and scores at least as well as the
        # banded host alignment
        got = _score(o, l, a, b)
        ho, hl, hne = nw_cigar(a, b)
        want = _score(ho, hl, a, b)
        assert got >= want - 1e-9, (got, want)


def test_nw_cigar_band_covers_length_difference():
    a = cseq.encode("A" * 10)
    b = cseq.encode("A" * 200)
    o, l, ne = nw_cigar(a, b)
    assert ccigar.query_len(o, l) == 10
    assert ccigar.target_len(o, l) == 200
    assert ne == 10
