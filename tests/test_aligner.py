"""Aligner tests: minimizers, chaining, extension, end-to-end mapping."""

import numpy as np
import pytest

from haslr_tpu.aligner import map as amap
from haslr_tpu.aligner import minimizer as mz
from haslr_tpu.aligner.extend import nw_cigar
from haslr_tpu.aligner.index import MinimizerIndex
from haslr_tpu.core import cigar as ccigar
from haslr_tpu.core import io as cio
from haslr_tpu.core import seq as cseq


def _rand_seq(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


def test_minimizers_deterministic_and_strand_symmetric():
    rng = np.random.default_rng(0)
    s = _rand_seq(rng, 500)
    codes = cseq.encode(s)
    h1, p1, e1, s1 = mz.minimizers(codes, 15, 10)
    h2, p2, e2, s2 = mz.minimizers(codes, 15, 10)
    np.testing.assert_array_equal(h1, h2)
    # reverse complement picks the same canonical hashes
    h3, p3, e3, s3 = mz.minimizers(cseq.revcomp_codes(codes), 15, 10)
    assert set(map(int, h1)) == set(map(int, h3))


def test_minimizers_density():
    rng = np.random.default_rng(1)
    codes = cseq.encode(_rand_seq(rng, 10000))
    h, p, e, s = mz.minimizers(codes, 15, 10)
    # expected density ~ 2/(w+1)
    assert 0.1 < len(h) / 10000 < 0.3
    assert (np.diff(p) > 0).all()


def test_hpc_compress():
    codes = cseq.encode("AAACCGGGGT")
    comp, pos = mz.hpc_compress(codes)
    assert cseq.decode(comp) == "ACGT"
    np.testing.assert_array_equal(pos, [0, 3, 5, 9])


def test_nw_cigar_simple():
    a = cseq.encode("ACGTACGT")
    o, l, ne = nw_cigar(a, a)
    assert ccigar.to_string(o, l) == "8M"
    assert ne == 8
    o, l, ne = nw_cigar(a, cseq.encode("ACGACGT"))  # deletion in target
    assert ccigar.query_len(o, l) == 8
    assert ccigar.target_len(o, l) == 7


def test_map_read_exact_fragment():
    rng = np.random.default_rng(2)
    contig = _rand_seq(rng, 3000)
    read = contig[500:2500]
    codes = [cseq.encode(contig)]
    idx = MinimizerIndex.build(codes, 15, 10)
    recs = amap.map_read(idx, cseq.encode(read), "0", codes, ["0"])
    assert len(recs) == 1
    r = recs[0]
    assert r.strand == "+"
    assert r.mapq == 60
    assert abs(r.t_start - 500) < 20
    assert abs(r.t_end - 2500) < 20
    assert r.n_match == r.n_block  # exact fragment
    assert "M" in r.cigar and "I" not in r.cigar and "D" not in r.cigar


def test_map_read_reverse_strand():
    rng = np.random.default_rng(3)
    contig = _rand_seq(rng, 3000)
    read = cseq.revcomp(contig[500:2500])
    codes = [cseq.encode(contig)]
    idx = MinimizerIndex.build(codes, 15, 10)
    recs = amap.map_read(idx, cseq.encode(read), "0", codes, ["0"])
    assert len(recs) == 1
    r = recs[0]
    assert r.strand == "-"
    assert abs(r.t_start - 500) < 20
    assert abs(r.t_end - 2500) < 20


def test_map_read_with_errors_identity():
    rng = np.random.default_rng(4)
    contig = _rand_seq(rng, 4000)
    frag = list(contig[200:3800])
    # ~5% errors
    out = []
    for ch in frag:
        r = rng.random()
        if r < 0.017:
            continue
        if r < 0.033:
            out.append("ACGT"[rng.integers(0, 4)])
        else:
            out.append(ch)
            if r < 0.05:
                out.append("ACGT"[rng.integers(0, 4)])
    read = "".join(out)
    codes = [cseq.encode(contig)]
    idx = MinimizerIndex.build(codes, 15, 10)
    recs = amap.map_read(idx, cseq.encode(read), "0", codes, ["0"])
    assert len(recs) == 1
    r = recs[0]
    assert r.n_match / r.n_block > 0.9
    # CIGAR consumes exactly the reported spans
    ops, lens = ccigar.parse(r.cigar)
    assert ccigar.query_len(ops, lens) == r.q_end - r.q_start
    assert ccigar.target_len(ops, lens) == r.t_end - r.t_start


def test_map_read_split_across_contigs():
    """A read spanning two contigs yields two PAF records (the multi-
    alignment behavior HASLR's backbone graph depends on)."""
    rng = np.random.default_rng(5)
    genome = _rand_seq(rng, 6000)
    c1, c2 = genome[:2800], genome[3200:]
    read = genome[2000:4500]
    codes = [cseq.encode(c1), cseq.encode(c2)]
    idx = MinimizerIndex.build(codes, 15, 10)
    recs = amap.map_read(idx, cseq.encode(read), "7", codes, ["0", "1"])
    assert len(recs) == 2
    assert {r.t_name for r in recs} == {"0", "1"}
    recs.sort(key=lambda r: r.q_start)
    assert recs[0].q_start < 30
    assert recs[1].q_end > 2470


def test_map_reads_end_to_end(tmp_path):
    rng = np.random.default_rng(6)
    genome = _rand_seq(rng, 5000)
    cio.write_fasta(str(tmp_path / "c.fa"), [("0", genome[:2400]), ("1", genome[2600:])])
    reads = []
    for i in range(5):
        s = int(rng.integers(0, 2500))
        reads.append((str(i), genome[s : s + 2400]))
    cio.write_fasta(str(tmp_path / "r.fa"), reads)
    n = amap.map_reads(
        str(tmp_path / "c.fa"), str(tmp_path / "r.fa"),
        str(tmp_path / "m.paf"), read_type="nanopore",
    )
    assert n >= 5
    recs = list(cio.read_paf(str(tmp_path / "m.paf")))
    assert all(r.cigar for r in recs)


def test_chain_native_matches_python(monkeypatch):
    """The C++ chaining DP and the numpy fallback produce identical
    chains (scores and anchor index lists) on fuzzed anchor sets."""
    from haslr_tpu import native
    from haslr_tpu.aligner import chain as achain

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    for trial in range(30):
        n = int(rng.integers(1, 300))
        # a noisy diagonal plus uniform noise anchors, sorted by (t, q)
        diag = rng.integers(0, 20_000, size=n // 2)
        t1 = diag + rng.integers(-30, 30, size=len(diag))
        q1 = diag + rng.integers(-30, 30, size=len(diag))
        t2 = rng.integers(0, 20_000, size=n - len(diag))
        q2 = rng.integers(0, 20_000, size=n - len(diag))
        t = np.concatenate([t1, t2])
        q = np.concatenate([q1, q2])
        order = np.lexsort((q, t))
        t, q = t[order].astype(np.int64), q[order].astype(np.int64)
        nat = achain.chain_anchors(t, q, k=17)
        monkeypatch.setattr(native, "chain_anchors_native",
                            lambda *a, **kw: None)
        py = achain.chain_anchors(t, q, k=17)
        monkeypatch.undo()
        assert len(nat) == len(py), trial
        for (s1, i1), (s2, i2) in zip(nat, py):
            assert s1 == pytest.approx(s2, abs=1e-9)
            assert np.array_equal(i1, i2)


def test_mapcig_native_matches_python():
    """Whole-chunk C++ mapping->CIGAR conversion matches the Python
    per-row converter on fuzzed alignments."""
    from haslr_tpu import native
    from haslr_tpu.aligner.extend import mapping_to_cigar
    from haslr_tpu.kernels import nw as knw

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    B, S = 16, 96
    reads = np.full((B, S), 4, np.uint8)
    drafts = np.full((B, S), 4, np.uint8)
    r_lens = np.zeros(B, np.int32)
    d_lens = np.zeros(B, np.int32)
    segs = []
    for b in range(B):
        t = rng.integers(0, 4, rng.integers(10, S), dtype=np.uint8)
        # mutate into q
        q = t.copy()
        mask = rng.random(len(q)) < 0.15
        q[mask] = rng.integers(0, 4, mask.sum(), dtype=np.uint8)
        q = q[rng.random(len(q)) > 0.05]
        q = q[: S]
        segs.append((q, t))
        reads[b, : len(q)] = q
        drafts[b, : len(t)] = t
        r_lens[b], d_lens[b] = len(q), len(t)
    mapping = knw.align_mapping_device(
        reads, r_lens, drafts, d_lens, 64, 2, -4, -2
    )
    rows = native.mapping_cigars_native(mapping, reads, drafts, r_lens,
                                        d_lens)
    assert rows is not None
    for b, (q, t) in enumerate(segs):
        ops, lens, neq = mapping_to_cigar(mapping[b], q, t)
        n_ops, n_lens, n_neq = rows[b]
        assert np.array_equal(ops, n_ops), b
        assert np.array_equal(lens, n_lens), b
        assert neq == n_neq, b


def test_native_paf_writer_byte_identical(tmp_path, monkeypatch):
    """native/paf.cpp must produce byte-identical output to the Python
    PafRecord.to_line fallback on a real mapping run."""
    import numpy as np

    from haslr_tpu import native
    from haslr_tpu.aligner.map import map_reads
    from haslr_tpu.testutil import simulate

    rng = np.random.default_rng(14)
    genome = simulate.genome_with_repeats(
        rng, 15_000, n_families=2, copies_per_family=3, repeat_len=300
    )
    ctg = str(tmp_path / "ctg.fa")
    with open(ctg, "w") as fp:
        for i in range(0, len(genome) - 1500, 1500):
            fp.write(f">{i // 1500}\n{genome[i:i + 2000]}\n")
    reads = simulate.make_reads(
        rng, genome, coverage=3.0, mean_len=5000, error_rate=0.06
    )
    lr = str(tmp_path / "lr.fa")
    with open(lr, "w") as fp:
        for r in reads:
            fp.write(f">{r.rid}\n{r.seq}\n")
    p_nat = str(tmp_path / "nat.paf")
    p_py = str(tmp_path / "py.paf")
    n1 = map_reads(ctg, lr, p_nat)
    monkeypatch.setattr(native, "paf_write_native",
                        lambda *a, **k: None)
    n2 = map_reads(ctg, lr, p_py)
    assert n1 == n2 and n1 > 0
    with open(p_nat, "rb") as f:
        a = f.read()
    with open(p_py, "rb") as f:
        b = f.read()
    assert a == b
