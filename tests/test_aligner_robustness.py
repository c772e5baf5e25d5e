"""Aligner robustness at nanopore-grade error with diverged repeats.

VERDICT round-3 gap: all e2e validation used a benign uniform iid error
model and exact repeat copies.  These tests drive the aligner with the
hardened simulator — homopolymer-biased indels at 10-12% error (the mode
the reference's ``-Hk17``/``-k15`` presets exist for, bin/haslr.py:90-95)
and 97-99%-identity repeat families — and assert:

- mapping ACCURACY against the known true placement (the simulator
  records every read's genome span);
- the MAPQ competitor heuristic (aligner/map.py) actually suppresses
  multi-mapping reads drawn from inside diverged repeat copies, while
  unique-region reads keep MAPQ >= 55 (the reference's keep threshold,
  Longread.cpp:268).
"""

import numpy as np
import pytest

from haslr_tpu.aligner import map as amap
from haslr_tpu.core import io as cio
from haslr_tpu.testutil import simulate


def _write_contigs(path, contigs):
    with open(path, "w") as fp:
        for c in contigs:
            fp.write(
                f">{c.cid} LN:i:{len(c.seq)} KC:i:{c.kc} km:f:{c.km:.3f}\n"
                f"{c.seq}\n"
            )


def _contig_interval(contigs):
    return {str(c.cid): (c.start, c.end, c.is_rev) for c in contigs}


def test_mapping_accuracy_nanopore_grade(tmp_path):
    """>= 90% of MAPQ>=55 records place the read at its true genome
    locus at 11% homopolymer-biased error over a diverged-repeat
    genome, and most reads get at least one accepted mapping."""
    rng = np.random.default_rng(5)
    genome = simulate.genome_with_repeats(
        rng, 60_000, n_families=2, copies_per_family=4, repeat_len=500,
        divergence=0.02,
    )
    contigs = simulate.make_contigs(rng, genome, mean_len=2500, gap_len=150)
    reads = simulate.make_reads(
        rng, genome, coverage=3.0, mean_len=6000, error_rate=0.11,
        homopolymer_bias=1.0,
    )
    contig_path = tmp_path / "contigs.fa"
    _write_contigs(contig_path, contigs)
    reads_path = tmp_path / "lr.fa"
    with open(reads_path, "w") as fp:
        for r in reads:
            fp.write(f">{r.rid}\n{r.seq}\n")
    paf = tmp_path / "map.paf"
    n = amap.map_reads(
        str(contig_path), str(reads_path), str(paf), read_type="nanopore"
    )
    assert n > 0
    spans = {str(r.rid): (r.start, r.end) for r in reads}
    iv = _contig_interval(contigs)
    good = total = 0
    mapped_reads = set()
    for rec in cio.read_paf(str(paf)):
        if rec.mapq < 55:
            continue
        total += 1
        mapped_reads.add(rec.q_name)
        c_start, c_end, c_rev = iv[rec.t_name]
        # genome interval the record claims
        if c_rev:
            g_lo = c_end - rec.t_end
            g_hi = c_end - rec.t_start
        else:
            g_lo = c_start + rec.t_start
            g_hi = c_start + rec.t_end
        r_lo, r_hi = spans[rec.q_name]
        overlap = min(g_hi, r_hi) - max(g_lo, r_lo)
        if overlap >= 0.8 * (g_hi - g_lo):
            good += 1
    assert total >= 20
    accuracy = good / total
    assert accuracy >= 0.90, (good, total)
    # the majority of reads long enough to anchor get an accepted mapping
    n_candidates = sum(1 for r in reads if len(r.seq) >= 1000)
    assert len(mapped_reads) >= 0.6 * n_candidates


@pytest.mark.parametrize("divergence", [0.0, 0.02])
def test_mapq_suppresses_repeat_multimappers(tmp_path, divergence):
    """Reads drawn ENTIRELY from inside a repeat copy must mostly fail
    the MAPQ>=55 filter (competitor chains at the other copies), while
    unique-region reads mostly pass — at exact copies and at 98%
    identity."""
    rng = np.random.default_rng(7)
    repeat_len = 3000
    genome, layout = simulate.genome_with_repeats(
        rng, 50_000, n_families=1, copies_per_family=4,
        repeat_len=repeat_len, divergence=divergence, return_layout=True,
    )
    contigs = simulate.make_contigs(
        rng, genome, mean_len=6000, gap_len=100, rev_fraction=0.0,
        shuffle=False,
    )
    # classify genome positions by the planted copy layout (overlapping
    # plants may overwrite earlier ones, so require clearance from ALL
    # plants for "unique" and containment in the LAST overlapping plant
    # for "repeat")
    plants = [(pos, pos + length) for _fi, pos, length in layout]

    def in_repeat(lo, hi):
        return any(p_lo <= lo and hi <= p_hi for p_lo, p_hi in plants)

    def clear_of_repeats(lo, hi):
        return all(hi <= p_lo or lo >= p_hi for p_lo, p_hi in plants)

    read_len = 1200
    rep_reads, uniq_reads = [], []
    for pos in range(0, len(genome) - read_len, 61):
        if in_repeat(pos, pos + read_len):
            bucket = rep_reads
        elif clear_of_repeats(pos, pos + read_len):
            bucket = uniq_reads
        else:
            continue
        if len(bucket) >= 25:
            continue
        template = genome[pos : pos + read_len]
        seq, _, _ = simulate.mutate_with_trace(rng, template, 0.05)
        bucket.append(seq)
    assert len(rep_reads) >= 10 and len(uniq_reads) >= 10

    contig_path = tmp_path / "contigs.fa"
    _write_contigs(contig_path, contigs)
    reads_path = tmp_path / "lr.fa"
    with open(reads_path, "w") as fp:
        for i, s in enumerate(rep_reads):
            fp.write(f">rep{i}\n{s}\n")
        for i, s in enumerate(uniq_reads):
            fp.write(f">uniq{i}\n{s}\n")
    paf = tmp_path / "map.paf"
    amap.map_reads(
        str(contig_path), str(reads_path), str(paf), read_type="pacbio"
    )
    best_mapq: dict[str, int] = {}
    for rec in cio.read_paf(str(paf)):
        best_mapq[rec.q_name] = max(
            best_mapq.get(rec.q_name, 0), rec.mapq
        )
    rep_pass = sum(
        1 for i in range(len(rep_reads))
        if best_mapq.get(f"rep{i}", 0) >= 55
    )
    uniq_pass = sum(
        1 for i in range(len(uniq_reads))
        if best_mapq.get(f"uniq{i}", 0) >= 55
    )
    assert rep_pass / len(rep_reads) <= 0.3, (rep_pass, len(rep_reads))
    assert uniq_pass / len(uniq_reads) >= 0.7, (uniq_pass, len(uniq_reads))


def test_homopolymer_bias_changes_error_profile():
    """Sanity: with bias on, indels concentrate in homopolymer runs and
    inserted bases extend the run; with bias 0 the legacy stream is
    byte-identical."""
    rng1 = np.random.default_rng(11)
    rng2 = np.random.default_rng(11)
    template = "".join(
        "ACGT"[i % 4] * int(n)
        for i, n in enumerate(
            np.random.default_rng(0).integers(1, 8, 400)
        )
    )
    legacy = simulate.mutate_with_trace(rng1, template, 0.1)
    legacy2 = simulate.mutate_with_trace(rng2, template, 0.1,
                                         homopolymer_bias=0.0)
    assert legacy[0] == legacy2[0]
    assert legacy[1] == legacy2[1]

    # measure indel rate in long runs vs elsewhere under bias
    rng = np.random.default_rng(13)
    run_base = "A" * 12
    spacer = "CGTCGTAGTACGATCG"
    tmpl = (run_base + spacer) * 300
    _, ops, _ = simulate.mutate_with_trace(
        rng, tmpl, 0.08, homopolymer_bias=1.0
    )
    unit = len(run_base) + len(spacer)
    run_indel = sp_indel = 0
    for i, (op, n_ins) in enumerate(ops):
        in_run = (i % unit) < len(run_base)
        hit = (op == "D") + n_ins
        if in_run:
            run_indel += hit
        else:
            sp_indel += hit
    run_rate = run_indel / (300 * len(run_base))
    sp_rate = sp_indel / (300 * len(spacer))
    assert run_rate > 1.5 * sp_rate, (run_rate, sp_rate)
