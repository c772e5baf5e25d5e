"""Cross-validation of sr/nooverlap.py against the REFERENCE binary.

``minia_nooverlap`` is the one reference executable that builds offline
(zlib only — ``/root/reference/src/minia_nooverlap/Makefile``; everything
else needs a git clone of SPOA or a binary download, impossible with zero
egress).  This test compiles the reference's own ``nooverlap.cpp``
verbatim, runs it and :func:`haslr_tpu.sr.nooverlap.remove_overlaps` on
the same minia-style FASTA, and asserts the outputs are byte-identical —
the only stage where our golden fixtures can be validated against
reference-generated rather than self-generated truth.

Reference semantics pinned here (``nooverlap.cpp:30-89``):
- the first three comment tokens (LN/KC/km) are skipped; each remaining
  link token's character [2] decides: '+' = outgoing, '-' = incoming;
- incoming => drop the first (k-1)/2 bases; outgoing => drop the last
  (k-1)/2 (both can apply);
- headers pass through unchanged, sequence case preserved.
"""

import os
import shutil
import subprocess

import pytest

from haslr_tpu.sr.nooverlap import remove_overlaps

REF_SRC = "/root/reference/src/minia_nooverlap"


@pytest.fixture(scope="module")
def ref_binary(tmp_path_factory):
    if not os.path.isdir(REF_SRC) or shutil.which("g++") is None:
        pytest.skip("reference source or g++ unavailable")
    d = tmp_path_factory.mktemp("nooverlap_ref")
    for f in ("nooverlap.cpp", "kseq.h"):
        shutil.copy(os.path.join(REF_SRC, f), d)
    exe = d / "minia_nooverlap"
    res = subprocess.run(
        ["g++", "-O2", "nooverlap.cpp", "-lz", "-o", str(exe)],
        cwd=d, capture_output=True,
    )
    if res.returncode != 0:
        pytest.skip(f"reference build failed: {res.stderr.decode()[:200]}")
    return str(exe)


def _minia_fasta(path):
    """Minia-style records covering every link topology the header
    grammar allows: no links, outgoing only, incoming only, both, and
    multi-link ends (several L: fields per side)."""
    rows = [
        # no links: untouched
        (">0 LN:i:60 KC:i:100 km:f:10.0", "A" * 30 + "C" * 30),
        # one outgoing (+): right end trimmed
        (">1 LN:i:80 KC:i:200 km:f:11.5 L:+:2:+", "AC" * 40),
        # one incoming (-): left end trimmed
        (">2 LN:i:80 KC:i:150 km:f:9.9 L:-:1:-", "GT" * 40),
        # both sides linked
        (">3 LN:i:100 KC:i:321 km:f:12.1 L:+:4:- L:-:2:+", "ACGT" * 25),
        # multi-link on each side (branching dBG node)
        (
            ">4 LN:i:120 KC:i:77 km:f:3.2 L:+:0:+ L:+:1:- L:-:3:+ L:-:2:-",
            "CCGGTTAA" * 15,
        ),
        # links only on the minus side, several of them
        (">5 LN:i:64 KC:i:50 km:f:5.0 L:-:0:+ L:-:4:+", "T" * 64),
        # short sequence where trimming removes most of it
        (">6 LN:i:30 KC:i:10 km:f:1.5 L:+:5:- L:-:5:+", "G" * 30),
    ]
    with open(path, "w") as fp:
        for header, seq in rows:
            fp.write(f"{header}\n{seq}\n")


@pytest.mark.parametrize("k", [49, 31, 17])
def test_byte_identical_to_reference_binary(ref_binary, tmp_path, k):
    src = tmp_path / "unitigs.fa"
    _minia_fasta(src)
    ref_out = subprocess.run(
        [ref_binary, str(src), str(k)], capture_output=True, check=True
    ).stdout
    ours = tmp_path / "ours.fa"
    remove_overlaps(str(src), str(ours), k)
    assert ours.read_bytes() == ref_out


def test_byte_identical_on_pipeline_artifact(ref_binary, tmp_path):
    """Same assertion on a REAL artifact: the contigs our own SR stage
    emits for a small simulated genome (the file the pipeline actually
    feeds through the nooverlap stage)."""
    import numpy as np

    from haslr_tpu.sr.assemble_sr import assemble_short_reads
    from haslr_tpu.testutil import simulate

    rng = np.random.default_rng(11)
    genome = simulate.genome_with_repeats(
        rng, 60_000, n_families=2, copies_per_family=3, repeat_len=300
    )
    srs = simulate.make_short_reads(rng, genome, coverage=25.0)
    sr_path = tmp_path / "sr.fq"
    simulate.write_short_reads(str(sr_path), srs)
    contigs = tmp_path / "contigs.fa"
    assemble_short_reads(
        [str(sr_path)], str(contigs), kmer_size=31, min_abundance=3,
        asm_type="contigs", device=False,
    )
    ref_out = subprocess.run(
        [ref_binary, str(contigs), "31"], capture_output=True, check=True
    ).stdout
    ours = tmp_path / "ours.fa"
    remove_overlaps(str(contigs), str(ours), 31)
    assert ours.read_bytes() == ref_out
