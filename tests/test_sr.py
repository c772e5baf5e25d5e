"""Short-read side tests: k-mer counting, de Bruijn compaction, nooverlap,
fastutils equivalents."""

from collections import Counter

import numpy as np
import pytest

from haslr_tpu.core import io as cio
from haslr_tpu.core import seq as cseq
from haslr_tpu.kernels import kmer as kk
from haslr_tpu.sr import dbg, fastutils, nooverlap
from haslr_tpu.sr.assemble_sr import assemble_short_reads
from haslr_tpu.testutil import simulate


def _rand_seq(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


@pytest.mark.parametrize("k", [15, 31, 49])
def test_kmer_count_host_vs_device_vs_bruteforce(k):
    rng = np.random.default_rng(0)
    s = _rand_seq(rng, 400)
    codes = np.concatenate(
        [cseq.encode(s), [4], cseq.encode(s[100:300])]
    ).astype(np.uint8)
    hi, lo, cnt = kk.count_kmers_host(codes, k)
    brute = Counter()
    for part in (s, s[100:300]):
        for i in range(len(part) - k + 1):
            km = part[i : i + k]
            brute[min(km, cseq.revcomp(km))] += 1
    assert len(cnt) == len(brute)
    assert int(cnt.sum()) == sum(brute.values())
    dhi, dlo, dcnt = kk.count_kmers_device(codes, k)
    np.testing.assert_array_equal(hi, dhi)
    np.testing.assert_array_equal(lo, dlo)
    np.testing.assert_array_equal(cnt, dcnt)


@pytest.mark.parametrize("k,min_count,prefix_bits", [
    (49, 1, 2), (49, 3, 4), (31, 2, 3), (15, 1, 2), (5, 2, 1),
])
def test_kmer_streaming_matches_host(k, min_count, prefix_bits, tmp_path):
    """The scale-proof streaming counter (chunked input, prefix-partition
    merge, bounded memory) must reproduce the single-shot counter bit for
    bit, including the poly-T edge case where a canonical k-mer's first
    word is all-ones (the pad sentinel)."""
    from haslr_tpu.kernels.kmer_stream import count_kmers_streaming

    rng = np.random.default_rng(3)
    reads = [
        rng.integers(0, 4, rng.integers(60, 300)).astype(np.uint8)
        for _ in range(120)
    ]
    reads.append(np.full(80, 3, np.uint8))  # poly-T run
    concat = []
    for r in reads:
        concat.append(r)
        concat.append(np.array([kk.SEP], np.uint8))
    codes = np.concatenate(concat)
    hh, hl, hc = kk.count_kmers_host(codes, k, min_count)
    sh, sl, sc = count_kmers_streaming(
        reads, k, min_count, chunk_bases=8192, prefix_bits=prefix_bits,
        spill_dir=str(tmp_path / "spill") if prefix_bits == 4 else None,
    )
    np.testing.assert_array_equal(hh, sh)
    np.testing.assert_array_equal(hl, sl)
    np.testing.assert_array_equal(hc, sc)


def test_kmer_streaming_sharded_matches_host():
    """Phase-2 partition merges sharded over the 8-device mesh (one
    prefix partition per device, no collective) must be bit-identical to
    the host counter — the multi-chip k-mer path of SURVEY §2.3."""
    import jax

    from haslr_tpu.dist.mesh import make_mesh
    from haslr_tpu.kernels.kmer_stream import count_kmers_streaming

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh(8)
    rng = np.random.default_rng(5)
    k = 31
    reads = [
        rng.integers(0, 4, rng.integers(60, 300)).astype(np.uint8)
        for _ in range(150)
    ]
    reads.append(np.full(70, 3, np.uint8))  # poly-T edge case
    concat = []
    for r in reads:
        concat.append(r)
        concat.append(np.array([kk.SEP], np.uint8))
    codes = np.concatenate(concat)
    hh, hl, hc = kk.count_kmers_host(codes, k, 2)
    sh, sl, sc = count_kmers_streaming(
        reads, k, 2, chunk_bases=8192, prefix_bits=3, mesh=mesh
    )
    np.testing.assert_array_equal(hh, sh)
    np.testing.assert_array_equal(hl, sl)
    np.testing.assert_array_equal(hc, sc)


def test_kmer_streaming_device_acc_compact_and_spill():
    """The device-resident accumulator's self-compaction (in-place merge
    when the row budget fills) and its last-resort spill to the host
    partition store must both preserve bit-identity with the host
    counter."""
    from haslr_tpu.kernels.kmer_stream import count_kmers_streaming

    rng = np.random.default_rng(9)
    # high duplication so self-compaction actually shrinks the rows
    pool = [rng.integers(0, 4, 200).astype(np.uint8) for _ in range(6)]
    reads = [pool[int(rng.integers(0, 6))] for _ in range(300)]
    reads += [
        rng.integers(0, 4, rng.integers(60, 200)).astype(np.uint8)
        for _ in range(100)
    ]
    concat = []
    for r in reads:
        concat.append(r)
        concat.append(np.array([kk.SEP], np.uint8))
    codes = np.concatenate(concat)
    hh, hl, hc = kk.count_kmers_host(codes, 31, 2)
    # budget large enough to hold the distinct rows but far below the
    # raw per-chunk row stream -> repeated self-compaction
    sh, sl, sc = count_kmers_streaming(
        reads, 31, 2, chunk_bases=4096, device_rows_budget=1 << 13
    )
    np.testing.assert_array_equal(hh, sh)
    np.testing.assert_array_equal(hc, sc)
    # budget below even the distinct rows -> spill to the host store
    sh2, sl2, sc2 = count_kmers_streaming(
        reads, 31, 2, chunk_bases=4096, device_rows_budget=1 << 9
    )
    np.testing.assert_array_equal(hh, sh2)
    np.testing.assert_array_equal(hl, sl2)
    np.testing.assert_array_equal(hc, sc2)


def test_kmer_abundance_filter():
    codes = np.concatenate(
        [cseq.encode("ACGTACGTAC"), [4], cseq.encode("ACGTACGTAC")]
    ).astype(np.uint8)
    hi, lo, cnt = kk.count_kmers_host(codes, 5, min_count=2)
    assert (cnt >= 2).all()


def test_rc_int_roundtrip():
    rng = np.random.default_rng(1)
    for k in (7, 31, 49):
        v = int(rng.integers(0, 1 << min(30, 2 * k)))
        assert dbg.rc_int(dbg.rc_int(v, k), k) == v
        s = dbg.kmer_to_str(v, k)
        assert dbg.kmer_to_str(dbg.rc_int(v, k), k) == cseq.revcomp(s)


def test_unitigs_single_chain():
    """Error-free coverage of a random (repeat-free) genome compacts into
    one unitig spanning the whole genome."""
    rng = np.random.default_rng(2)
    genome = _rand_seq(rng, 2000)
    k = 31
    codes = cseq.encode(genome)
    unitigs = dbg.assemble_unitigs(codes, k, 1, device=False)
    assert len(unitigs) == 1
    u = unitigs[0]
    assert u.seq in (genome, cseq.revcomp(genome))
    assert u.kc_positions == len(genome) - k + 1
    assert u.links == []


def test_bubble_popping_het_snp():
    """A heterozygous SNP splits the dBG into a 4-unitig bubble; minia-
    style contig simplification must pop the weaker branch and re-compact
    to the homozygous contig count (one)."""
    rng = np.random.default_rng(7)
    genome = _rand_seq(rng, 3000)
    pos = 1500
    alt_base = "ACGT"[("ACGT".index(genome[pos]) + 1) % 4]
    variant = genome[:pos] + alt_base + genome[pos + 1 :]
    k = 31
    # higher coverage on the reference haplotype -> it must win
    codes = np.concatenate(
        [cseq.encode(genome), [4]] * 3 + [cseq.encode(variant), [4]] * 2
    ).astype(np.uint8)
    from haslr_tpu.kernels import kmer as kk

    hi, lo, cnt = kk.count_kmers_host(codes, k, 1)
    # sanity: the bubble exists before popping
    raw = dbg.unitigs_from_counts(hi, lo, cnt, k, native=False)
    assert len(raw) == 4
    bubbles = dbg.find_simple_bubbles(raw, k)
    assert len(bubbles) == 1
    popped = dbg.pop_bubbles(hi, lo, cnt, k, native=False)
    assert len(popped) == 1
    assert popped[0].seq in (genome, cseq.revcomp(genome))


def test_bubble_popping_keeps_repeats():
    """Long divergent paths (genuine repeats/alleles) must NOT pop."""
    rng = np.random.default_rng(8)
    a = _rand_seq(rng, 800)
    mid1 = _rand_seq(rng, 400)
    mid2 = _rand_seq(rng, 400)
    b = _rand_seq(rng, 800)
    k = 31
    codes = np.concatenate(
        [cseq.encode(a + mid1 + b), [4], cseq.encode(a + mid2 + b), [4]]
    ).astype(np.uint8)
    from haslr_tpu.kernels import kmer as kk

    hi, lo, cnt = kk.count_kmers_host(codes, k, 1)
    raw = dbg.unitigs_from_counts(hi, lo, cnt, k, native=False)
    popped = dbg.pop_bubbles(hi, lo, cnt, k, native=False)
    assert len(popped) == len(raw)


def test_unitigs_break_at_repeat():
    """A repeated block forces junctions: expect >1 unitig and links."""
    rng = np.random.default_rng(3)
    a = _rand_seq(rng, 600)
    b = _rand_seq(rng, 600)
    rep = _rand_seq(rng, 200)
    genome = a + rep + b + rep + _rand_seq(rng, 300)
    k = 31
    unitigs = dbg.assemble_unitigs(cseq.encode(genome), k, 1, device=False)
    assert len(unitigs) >= 4
    # total unique sequence ~ genome minus one repeat copy
    total = sum(len(u.seq) for u in unitigs)
    assert total > len(genome) - 250 - 4 * k
    assert any(u.links for u in unitigs)


def test_sr_assembly_from_reads(tmp_path):
    """Short reads at 40x -> unitigs covering the genome."""
    rng = np.random.default_rng(4)
    genome = _rand_seq(rng, 8000)
    reads = simulate.make_short_reads(rng, genome, coverage=45.0)
    rp = str(tmp_path / "sr.fq")
    simulate.write_short_reads(rp, reads)
    out = str(tmp_path / "asm.fa")
    n = assemble_short_reads([rp], out, kmer_size=31, min_abundance=3,
                             device=False)
    recs = list(cio.read_fastx(out))
    assert len(recs) == n
    total = sum(len(r.seq) for r in recs)
    assert total > 0.95 * len(genome)
    # headers carry minia-style tags
    assert "KC:i:" in recs[0].comment and "km:f:" in recs[0].comment
    # genome kmers recovered
    def ks(s, k=31):
        return {
            min(s[i:i+k], cseq.revcomp(s[i:i+k]))
            for i in range(len(s) - k + 1)
        }
    gk = ks(genome)
    ak = set()
    for r in recs:
        ak |= ks(r.seq)
    assert len(gk & ak) / len(gk) > 0.95


def test_native_dbg_matches_python():
    """The C++ unitig walker must produce byte-identical unitigs, counts
    and links to the Python implementation."""
    from haslr_tpu import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(2)
    for k in (15, 31, 33, 49):
        genome = _rand_seq(rng, 3000)
        genome = genome[:1000] + genome[400:700] + genome[1000:]  # repeat
        codes = cseq.encode(genome)
        py = dbg.assemble_unitigs(codes, k, 1, device=False, native=False)
        nat = dbg.assemble_unitigs(codes, k, 1, device=False, native=True)
        assert len(py) == len(nat)
        for a, b in zip(py, nat):
            assert a.seq == b.seq
            assert a.kc == b.kc and a.kc_positions == b.kc_positions
            assert sorted(a.links) == sorted(b.links)


def test_native_pop_bubbles_matches_python():
    """The fully-native bubble-popping loop (hx_dbg_pop_run) must produce
    byte-identical unitigs to the Python pop_bubbles path."""
    from haslr_tpu import native
    from haslr_tpu.kernels import kmer as kk

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(9)
    k = 31
    genome = _rand_seq(rng, 6000)
    # three het SNPs + one repeat pair -> several bubbles, surviving repeat
    var = list(genome)
    for pos in (900, 2500, 4200):
        var[pos] = "ACGT"[("ACGT".index(genome[pos]) + 1) % 4]
    variant = "".join(var)
    genome2 = genome[:3000] + genome[1000:1400] + genome[3000:]
    codes = np.concatenate(
        [cseq.encode(genome2), [4]] * 3 + [cseq.encode(variant), [4]] * 2
    ).astype(np.uint8)
    hi, lo, cnt = kk.count_kmers_host(codes, k, 1)
    py = dbg.pop_bubbles(hi, lo, cnt, k, native=False)
    nat = dbg.pop_bubbles(hi, lo, cnt, k, native=True)
    assert len(py) == len(nat) and len(py) > 0
    for a, b in zip(py, nat):
        assert a.seq == b.seq
        assert a.kc == b.kc and a.kc_positions == b.kc_positions
        assert a.links == b.links


def test_native_pop_bubbles_scales_bounded_memory():
    """10^7 random solid k-mers through the native popping loop in bounded
    RSS — the CHM1-scale memory contract the Python dict path cannot
    meet.  Random k-mers form an almost edge-free graph, so this bounds
    table+walk memory, not bubble logic (covered above)."""
    import resource

    from haslr_tpu import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    from haslr_tpu.kernels.kmer import _revcomp_pair_np

    n = 10_000_000
    rng = np.random.default_rng(0)
    k = 31
    raw = rng.integers(0, 1 << 62, n, dtype=np.uint64)
    rc_hi, rc_lo = _revcomp_pair_np(np.zeros(n, np.uint64), raw, k)
    lo = np.unique(np.minimum(raw, rc_lo))
    hi = np.zeros(len(lo), np.uint64)
    cnt = rng.integers(1, 50, len(lo)).astype(np.uint32)
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    out = native.dbg_unitigs(hi, lo, cnt, k, pop_rounds=8)
    assert out is not None
    seqs, kc, nk, links = out
    assert len(seqs) > 0
    assert int(np.sum(nk)) <= len(lo)
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    # native tables ~42 B/kmer + arena; allow 6 GB of growth headroom
    assert rss1 - rss0 < 6 * 1024 * 1024, (
        f"RSS grew {(rss1 - rss0) / 1024:.0f} MB"
    )


def test_sr_stage_minia_parity_on_het_input(tmp_path):
    """minia-parity evidence for the SR stage on a heterozygous input at
    realistic coverage variance: the contig set's statistics must look
    like what the downstream anchors expect (Contig.cpp:43-117,
    calc_uniq_freq Contig.cpp:162-174) — het SNP bubbles popped, km
    distribution centered on the per-haplotype+shared coverage, and the
    top-20 uniq-freq estimate usable by the PAF filters."""
    rng = np.random.default_rng(21)
    genome = _rand_seq(rng, 120_000)
    # diploid: ~1 het SNP per 1000 bp on haplotype B
    var = list(genome)
    n_snp = 0
    for pos in range(500, len(genome) - 500, 1000):
        p = pos + int(rng.integers(-300, 300))
        var[p] = "ACGT"[("ACGT".index(genome[p]) + 1) % 4]
        n_snp += 1
    variant = "".join(var)
    # 2 x ~22x haplotype coverage (Poisson start sampling gives realistic
    # per-base variance), 0.2% substitution errors
    reads = simulate.make_short_reads(rng, genome, coverage=22.0)
    reads += simulate.make_short_reads(rng, variant, coverage=22.0)
    rp = str(tmp_path / "sr.fq")
    simulate.write_short_reads(rp, reads)
    out = str(tmp_path / "contigs.fa")
    k = 49
    n = assemble_short_reads([rp], out, kmer_size=k, min_abundance=3,
                             device=False)
    recs = list(cio.read_fastx(out))
    assert len(recs) == n
    lens = sorted((len(r.seq) for r in recs), reverse=True)
    total = sum(lens)
    # het bubbles popped -> contigs cover ~one haplotype's length, not two
    assert 0.9 * len(genome) < total < 1.25 * len(genome), total
    # contiguity: N50 far above the k-mer scale (bubbles broke nothing)
    acc = 0
    n50 = 0
    for L in lens:
        acc += L
        if acc >= total / 2:
            n50 = L
            break
    assert n50 > 20 * k, n50
    # km distribution: long contigs (shared sequence) sit near 2x22x
    # k-mer coverage; downstream's uniq-freq estimate (mean km of the 20
    # longest, Contig.cpp:162-174) must land in the same regime so the
    # "unique anchor" PAF filter keeps real anchors
    kms = {}
    for r in recs:
        for f in r.comment.split():
            if f.startswith("km:f:"):
                kms[r.name] = float(f[5:])
    expect = 2 * 22.0 * (150 - k + 1) / 150  # k-mer coverage, both haps
    top20 = sorted(recs, key=lambda r: -len(r.seq))[:20]
    uniq_freq = float(np.mean([kms[r.name] for r in top20]))
    assert 0.6 * expect < uniq_freq < 1.3 * expect, (uniq_freq, expect)
    # the anchors the backbone will use (>= 250 bp, the min-src filter)
    # must dominate the assembly
    big = sum(L for L in lens if L >= 250)
    assert big > 0.95 * total


def test_nooverlap(tmp_path):
    p = tmp_path / "u.fa"
    p.write_text(
        ">0 LN:i:20 KC:i:100 km:f:5.0 L:+:1:+\n"
        "AAAAAAAAAACCCCCCCCCC\n"
        ">1 LN:i:20 KC:i:100 km:f:5.0 L:-:0:- L:+:2:+\n"
        "GGGGGGGGGGTTTTTTTTTT\n"
        ">2 LN:i:20 KC:i:100 km:f:5.0 L:-:1:-\n"
        "ACACACACACGTGTGTGTGT\n"
    )
    out = tmp_path / "noov.fa"
    nooverlap.remove_overlaps(str(p), str(out), kmer_size=9)
    recs = list(cio.read_fastx(str(out)))
    # k=9 -> overlapLen=8 -> trim 4
    assert recs[0].seq == "AAAAAAAAAACCCCCC"          # outgoing only: tail trim
    assert recs[1].seq == "GGGGGGTTTTTT"              # both ends
    assert recs[2].seq == "ACACACGTGTGTGTGT"          # incoming only: head trim
    assert recs[1].comment.startswith("LN:i:20")


def test_fastutils(tmp_path):
    a = tmp_path / "a.fa"
    a.write_text(">x\nACGTACGT\n>y\nTT\n")
    out = tmp_path / "renamed.fa"
    n = fastutils.format_rename([str(a)], str(out))
    assert n == 2
    recs = list(cio.read_fastx(str(out)))
    assert [r.name for r in recs] == ["0", "1"]

    flt = tmp_path / "filtered.fa"
    n = fastutils.format_min_len(str(out), str(flt), 5)
    assert n == 1

    # subsample keeps longest reads up to the budget
    b = tmp_path / "b.fa"
    b.write_text(">r1\n" + "A" * 100 + "\n>r2\n" + "C" * 300 + "\n>r3\n" + "G" * 200 + "\n")
    sub = tmp_path / "sub.fa"
    n = fastutils.subsample_longest([str(b)], str(sub), depth=1.0,
                                    genome_size=400)
    recs = list(cio.read_fastx(str(sub)))
    assert [len(r.seq) for r in recs] == [300, 200]
    assert [r.name for r in recs] == ["0", "1"]


def test_subsample_streaming_same_set(tmp_path):
    """The streaming two-pass subsample keeps the SAME read set as the
    in-RAM path (order differs: input order vs length order), at every
    budget including tie-heavy ones."""
    import numpy as np

    rng = np.random.default_rng(9)
    b = tmp_path / "b.fa"
    lens = list(rng.integers(50, 500, 60)) + [250] * 10  # ties
    with b.open("w") as fp:
        for i, L in enumerate(lens):
            fp.write(f">r{i}\n" + "ACGT"[i % 4] * int(L) + "\n")
    for depth, gsize in [(1.0, 3000), (2.5, 2000), (1.0, 10**9), (0.0, 1)]:
        ram = tmp_path / "ram.fa"
        stream = tmp_path / "stream.fa"
        n1 = fastutils.subsample_longest(
            [str(b)], str(ram), depth, gsize, streaming=False
        )
        n2 = fastutils.subsample_longest(
            [str(b)], str(stream), depth, gsize, streaming=True
        )
        assert n1 == n2
        set1 = sorted(r.seq for r in cio.read_fastx(str(ram)))
        set2 = sorted(r.seq for r in cio.read_fastx(str(stream)))
        assert set1 == set2
        # ids are sequential in both modes
        assert [r.name for r in cio.read_fastx(str(stream))] == [
            str(i) for i in range(n2)
        ]


def test_native_counter_matches_host():
    """The native C++ counter (production single-host path) must be
    bit-identical to count_kmers_host at every k-word layout (k < 32,
    == 32, 32 < k < 64, == 64), thread count, and abundance filter."""
    import numpy as np

    from haslr_tpu import native
    from haslr_tpu.kernels import kmer as kk

    if native.get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    reads = [
        rng.integers(0, 4, int(L)).astype(np.uint8)
        for L in rng.integers(10, 300, 300)
    ]
    codes = np.concatenate(reads)
    offsets = np.zeros(len(reads) + 1, np.uint64)
    np.cumsum([len(r) for r in reads], out=offsets[1:])
    joined = np.concatenate(
        [np.concatenate([r, np.array([4], np.uint8)]) for r in reads]
    )
    for k in (15, 31, 32, 33, 49, 64):
        for mc in (1, 3):
            ref = kk.count_kmers_host(joined, k, mc)
            for nt in (1, 2):
                got = native.count_kmers_native(
                    codes, offsets, k, mc, n_threads=nt
                )
                for a, b in zip(got, ref):
                    assert np.array_equal(a, b), (k, mc, nt)


def test_assemble_short_reads_native_engine(tmp_path):
    """assemble_short_reads' auto path uses the native counter and emits
    the same contigs as the forced device-streaming path."""
    import numpy as np

    from haslr_tpu.sr import assemble_sr
    from haslr_tpu.testutil import simulate

    rng = np.random.default_rng(3)
    genome = simulate.genome_with_repeats(
        rng, 30_000, n_families=2, copies_per_family=3, repeat_len=300
    )
    srs = simulate.make_short_reads(rng, genome, coverage=30.0)
    sr_path = tmp_path / "sr.fq"
    simulate.write_short_reads(str(sr_path), srs)
    a = tmp_path / "a.fa"
    b = tmp_path / "b.fa"
    n1 = assemble_sr.assemble_short_reads(
        [str(sr_path)], str(a), kmer_size=31, min_abundance=3
    )
    engine = assemble_sr.PROF.get("count_engine")
    n2 = assemble_sr.assemble_short_reads(
        [str(sr_path)], str(b), kmer_size=31, min_abundance=3,
        streaming=True,
    )
    assert n1 == n2
    assert a.read_bytes() == b.read_bytes()
    if engine is not None:
        assert engine == "native"


@pytest.mark.parametrize("k", [31, 49])
def test_merge_kmer_counts_matches_single(k):
    """The multi-host path (per-shard count at min_count=1 + prefix-range
    merge, abundance filter after summation) must be bit-identical to
    counting the whole stream at once — including k-mers under the
    threshold in every shard but over it globally."""
    rng = np.random.default_rng(42)
    genome = rng.integers(0, 4, 20_000).astype(np.uint8)
    reads = []
    for _ in range(600):
        p = int(rng.integers(0, len(genome) - 120))
        reads.append(genome[p : p + 120])
    concat = []
    for r in reads:
        concat.append(r)
        concat.append(np.array([kk.SEP], np.uint8))
    full = np.concatenate(concat)
    want = kk.count_kmers_host(full, k, 3)

    n_shards = 4
    shards = []
    for s in range(n_shards):
        block = reads[s * len(reads) // n_shards
                      : (s + 1) * len(reads) // n_shards]
        cat = []
        for r in block:
            cat.append(r)
            cat.append(np.array([kk.SEP], np.uint8))
        shards.append(kk.count_kmers_host(np.concatenate(cat), k, 1))
    got = kk.merge_kmer_counts(shards, 3)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a, b)
    # a below-threshold-everywhere, above-globally k-mer must survive
    per_shard_max = np.zeros(0)
    assert (got[2] >= 3).all()


def test_merge_kmer_counts_native_sharded_pipeline(tmp_path):
    """assemble_sr._count_native_sharded == _count_native on a real
    fastq (the counting engines behind the single-host and multi-host
    pipeline paths)."""
    from haslr_tpu.sr.assemble_sr import _count_native, \
        _count_native_sharded

    rng = np.random.default_rng(9)
    genome = _rand_seq(rng, 30_000)
    srs = simulate.make_short_reads(rng, genome, coverage=25.0)
    sr = str(tmp_path / "sr.fq")
    simulate.write_short_reads(sr, srs)
    single = _count_native([sr], 49, 3)
    if single is None:
        pytest.skip("native library unavailable")
    sharded = _count_native_sharded([sr], 49, 3, 8)
    for a, b in zip(single, sharded):
        np.testing.assert_array_equal(a, b)
