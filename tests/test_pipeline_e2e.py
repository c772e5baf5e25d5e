"""Grand end-to-end test: raw short + long reads through the CLI driver —
every stage is ours (k-mer counting, dBG contigs, nooverlap, subsampling,
minimizer alignment, backbone assembly, consensus, stitching)."""

import os

import numpy as np
import pytest

from haslr_tpu.core import io as cio
from haslr_tpu.core import seq as cseq
from haslr_tpu.testutil import simulate


def kmer_set(s, k=31):
    return {
        min(s[i : i + k], cseq.revcomp(s[i : i + k]))
        for i in range(len(s) - k + 1)
    }


def test_pipeline_from_raw_reads(tmp_path):
    rng = np.random.default_rng(11)
    # repeats fragment the SR assembly into contigs; the long-read backbone
    # must bridge them (a repeat-free genome compacts into ONE contig and
    # HASLR-like pipelines then have no edges to build — faithful behavior)
    genome = simulate.genome_with_repeats(
        rng, 30_000, n_families=2, copies_per_family=4, repeat_len=400
    )
    srs = simulate.make_short_reads(rng, genome, coverage=45.0)
    sr_path = str(tmp_path / "sr.fq")
    simulate.write_short_reads(sr_path, srs)
    lrs = simulate.make_reads(rng, genome, coverage=18.0, mean_len=8000,
                              error_rate=0.05)
    lr_path = str(tmp_path / "lr.fa")
    with open(lr_path, "w") as fp:
        for r in lrs:
            fp.write(f">sim{r.rid} original_name\n{r.seq}\n")

    from haslr_tpu.cli.haslr import main

    out = str(tmp_path / "out")
    rc = main([
        "-o", out, "-g", "30k", "-l", lr_path, "-x", "pacbio",
        "-s", sr_path, "--minia-kmer", "49", "--cov-lr", "25",
    ])
    assert rc == 0
    # artifacts with reference-compatible names
    assert os.path.isfile(f"{out}/lr25x.fasta")
    assert os.path.isfile(f"{out}/sr_k49_a3.contigs.fa")
    assert os.path.isfile(f"{out}/sr_k49_a3.contigs.nooverlap.fa")
    assert os.path.isfile(f"{out}/sr_k49_a3.contigs.nooverlap.250.fa")
    assert os.path.isfile(f"{out}/map_contigs_k49_a3_c250_lr25x.paf")
    asm_dir = f"{out}/asm_contigs_k49_a3_c250_lr25x_b500_s3_sim0.85"
    final = f"{asm_dir}/asm.final.fa"
    assert os.path.isfile(final)
    assert os.path.isfile(f"{asm_dir}/backbone.01.init.gfa")

    recs = list(cio.read_fastx(final))
    total = sum(len(r.seq) for r in recs)
    assert total > 0.9 * len(genome)
    ak = set()
    for r in recs:
        ak |= kmer_set(r.seq)
    gk = kmer_set(genome[1500:-1500])
    recall = len(gk & ak) / len(gk)
    assert recall > 0.97, f"interior kmer recall {recall:.4f}"

    # resume: re-running skips every stage (outputs exist)
    rc = main([
        "-o", out, "-g", "30k", "-l", lr_path, "-x", "pacbio",
        "-s", sr_path, "--minia-kmer", "49", "--cov-lr", "25",
    ])
    assert rc == 0
