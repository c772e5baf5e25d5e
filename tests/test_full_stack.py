"""Full-stack test: our aligner's PAF feeding the assembler (no ground-
truth alignments), i.e. stage 3 of the build plan (SURVEY.md §7.2)."""

import numpy as np
import pytest

from haslr_tpu.aligner import map_reads
from haslr_tpu.assemble.pipeline import run_assembler
from haslr_tpu.config import AssembleConfig
from haslr_tpu.core import io as cio
from haslr_tpu.core import seq as cseq
from haslr_tpu.testutil import simulate


def kmer_set(s, k=31):
    return {
        min(s[i : i + k], cseq.revcomp(s[i : i + k]))
        for i in range(len(s) - k + 1)
    }


def test_own_aligner_to_assembly(tmp_path):
    out = str(tmp_path)
    genome, contigs, reads, (contig_path, lr_path, _) = simulate.simulate(
        out, genome_len=30_000, seed=7, coverage=16.0, error_rate=0.04,
        contig_mean_len=2000, contig_gap=250, rev_fraction=0.4,
    )
    own_paf = out + "/own_map.paf"
    n = map_reads(contig_path, lr_path, own_paf, read_type="pacbio")
    assert n > len(reads)  # every read should map, many to 2+ contigs

    stats = run_assembler(
        contig_path, lr_path, own_paf, out + "/asm",
        cfg=AssembleConfig(consensus_engine="poa"), log=None,
    )
    recs = list(cio.read_fastx(stats["assembly"]))
    total = sum(len(r.seq) for r in recs)
    assert total > 0.85 * len(genome)
    assert len(recs) <= 6
    ak = set()
    for r in recs:
        ak |= kmer_set(r.seq)
    gk_mid = kmer_set(genome[2500:-2500])
    recall = len(gk_mid & ak) / len(gk_mid)
    assert recall > 0.97, f"interior kmer recall {recall:.4f}"
