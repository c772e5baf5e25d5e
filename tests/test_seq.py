import numpy as np
import pytest

from haslr_tpu.core import seq


def test_encode_decode_roundtrip():
    s = "ACGTACGTTTGGCCA"
    assert seq.decode(seq.encode(s)) == s


def test_encode_lowercase_and_n():
    # non-ACGT maps to A, mirroring reference _dna_tableVal semantics
    assert seq.decode(seq.encode("acgtN")) == "ACGTA"


def test_revcomp():
    assert seq.revcomp("ACGT") == "ACGT"
    assert seq.revcomp("AACGTG") == "CACGTT"
    assert seq.revcomp("") == ""


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for n in [0, 1, 2, 3, 4, 5, 7, 8, 63, 64, 65, 1000]:
        codes = rng.integers(0, 4, size=n).astype(np.uint8)
        packed = seq.pack(codes)
        assert len(packed) == (n + 3) // 4
        out = seq.unpack(packed, n)
        np.testing.assert_array_equal(out, codes)


def test_seqstore():
    store = seq.SeqStore()
    seqs = ["ACGT", "GGGGGTTTTT", "A", "", "TTTACGTACGTACG"]
    for s in seqs:
        store.add_str(s)
    assert len(store) == len(seqs)
    for i, s in enumerate(seqs):
        assert store.get_str(i) == s
    # flat buffer is contiguous
    assert store.packed.dtype == np.uint8
    assert store.offsets[-1] == len(store.packed)


def test_seqstore_add_after_flatten():
    store = seq.SeqStore()
    store.add_str("ACGT")
    _ = store.packed
    store.add_str("TTTT")
    assert store.get_str(1) == "TTTT"
