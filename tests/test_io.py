import gzip

from haslr_tpu.core import io as cio


def test_fasta_roundtrip(tmp_path):
    p = tmp_path / "x.fa"
    recs = [("0", "KC:i:10 km:f:3.3", "ACGTACGT"), ("1", "", "TTTT")]
    cio.write_fasta(str(p), recs)
    out = list(cio.read_fastx(str(p)))
    assert [(r.name, r.comment, r.seq) for r in out] == [
        ("0", "KC:i:10 km:f:3.3", "ACGTACGT"),
        ("1", "", "TTTT"),
    ]


def test_fasta_multiline_and_gzip(tmp_path):
    p = tmp_path / "y.fa.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(">a c1 c2\nACGT\nACGT\n>b\nTT\n")
    out = list(cio.read_fastx(str(p)))
    assert out[0].name == "a"
    assert out[0].comment == "c1 c2"
    assert out[0].seq == "ACGTACGT"
    assert out[1].seq == "TT"


def test_fastq(tmp_path):
    p = tmp_path / "z.fq"
    p.write_text("@r1 some comment\nACGT\n+\nIIII\n@r2\nTT\n+\n##\n")
    out = list(cio.read_fastx(str(p)))
    assert out[0].name == "r1"
    assert out[0].seq == "ACGT"
    assert out[0].qual == "IIII"
    assert out[1].name == "r2"


def test_paf_roundtrip(tmp_path):
    line = (
        "12\t5000\t100\t900\t+\t3\t1200\t10\t820\t780\t810\t60\t"
        "tp:A:P\tcg:Z:500M10I300M"
    )
    rec = cio.parse_paf_line(line)
    assert rec.q_name == "12"
    assert rec.q_len == 5000
    assert rec.strand == "+"
    assert rec.t_name == "3"
    assert rec.n_match == 780
    assert rec.n_block == 810
    assert rec.mapq == 60
    assert rec.cigar == "500M10I300M"
    # round-trip through file
    p = tmp_path / "m.paf"
    p.write_text(rec.to_line() + "\n")
    back = list(cio.read_paf(str(p)))[0]
    assert back == rec
