import numpy as np
import pytest

from haslr_tpu.assemble.poa import PoaGraph, poa_consensus
from haslr_tpu.core import seq as cseq


def test_single_sequence_identity():
    s = "ACGTACGTTA"
    assert poa_consensus([s]) == s


def test_identical_sequences():
    s = "ACGTTGCAGGACCAT"
    assert poa_consensus([s] * 5) == s


def test_majority_substitution():
    good = "ACGTACGTACGTACGT"
    bad = "ACGTACGAACGTACGT"  # one substitution
    assert poa_consensus([good, good, bad]) == good


def test_majority_indel():
    good = "ACGTACGTACGTACGT"
    del1 = "ACGTACGACGTACGT"   # deletion
    ins1 = "ACGTACGTTACGTACGT"  # insertion
    assert poa_consensus([good, good, good, del1, ins1]) == good


def test_empty_inputs():
    assert poa_consensus([]) == ""
    assert poa_consensus(["", ""]) == ""
    assert poa_consensus(["", "ACGT"]) == "ACGT"


def test_noisy_window_recovery():
    rng = np.random.default_rng(11)
    bases = "ACGT"
    true = "".join(bases[i] for i in rng.integers(0, 4, 300))

    def mutate(s, rate=0.1):
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

    reads = [mutate(true, rate=0.08) for _ in range(15)]
    cons = poa_consensus(reads)
    # alignment-free identity proxy: shared 21-mers
    def kmers(s, k=21):
        return {s[i : i + k] for i in range(len(s) - k + 1)}

    shared = len(kmers(true) & kmers(cons)) / len(kmers(true))
    assert shared > 0.95, shared


def test_alignment_pairs_are_consistent():
    g = PoaGraph()
    g.add_sequence(cseq.encode("ACGTACGT"))
    pairs = g.align(cseq.encode("ACGGACGT"))
    # every sequence position appears exactly once, in order
    positions = [p for _, p in pairs if p is not None]
    assert positions == list(range(8))
