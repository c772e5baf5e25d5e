"""Stitching tests: path extraction, contig assembly, break-on-empty-
consensus, annotation format."""

import numpy as np
import pytest

from haslr_tpu.assemble import backbone as bb
from haslr_tpu.assemble.contig_store import ContigStore
from haslr_tpu.assemble.stitch import (
    assemble_single_path,
    extract_all_simple_paths,
    get_assembly,
)
from haslr_tpu.core import io as cio
from haslr_tpu.core import seq as cseq


def _setup_chain(seqs, cns_seqs):
    """Graph: chain of contigs with consensus sequences on the edges."""
    contigs = ContigStore()
    for s in seqs:
        contigs.add(s, 10, 30.0)
    g = [bb.BBGNode(contig_id=i) for i in range(len(seqs))]
    for i in range(len(seqs) - 1):
        e1 = g[i].edges[0].get_or_create(bb.edge_key(i + 1, 0))
        e2 = g[i + 1].edges[1].get_or_create(bb.edge_key(i, 1))
        for lid in range(5):
            e1.edge_supp.append(bb.EdgeSupp(lid, 0, 0, 1))
            e2.edge_supp.append(bb.EdgeSupp(lid, 1, 1, 0))
        cns = cns_seqs[i]
        e1.cns_seq = cns
        e2.cns_seq = cseq.revcomp(cns)
        if cns is not None:
            e1.cns_supp = [bb.CnsSupp(l, 0, 0, 10) for l in range(5)]
            e2.cns_supp = list(e1.cns_supp)
        # anchor full contigs: head_end = len-1, tail_beg = 0
        e1.head_end = len(seqs[i]) - 1
        e1.tail_beg = 0
        e2.head_end = len(seqs[i + 1]) - 1
        e2.tail_beg = 0
    return contigs, g


def test_stitch_simple_chain(tmp_path):
    seqs = ["ACGTACGTAC", "GGGTTTCCCA", "TTGGCCAATT"]
    cns = ["AAAA", "CCCC"]
    contigs, g = _setup_chain(seqs, cns)
    n = get_assembly(g, contigs, str(tmp_path))
    recs = list(cio.read_fastx(str(tmp_path / "asm.final.fa")))
    assert n == 1 and len(recs) == 1
    assert recs[0].seq == seqs[0] + "AAAA" + seqs[1] + "CCCC" + seqs[2]
    # annotation attributes every base
    ann = (tmp_path / "asm.final.ann").read_text().splitlines()
    assert len(ann) == 5  # ctg, cns, ctg, cns, ctg
    kinds = [row.split("\t")[3] for row in ann]
    assert kinds == ["ctg", "cns", "ctg", "cns", "ctg"]


def test_stitch_break_on_empty_support(tmp_path):
    """An edge with no consensus support breaks the output contig
    (Assemble.cpp:682-706)."""
    seqs = ["ACGTACGTAC", "GGGTTTCCCA", "TTGGCCAATT"]
    contigs, g = _setup_chain(seqs, ["AAAA", "CCCC"])
    # clear consensus support on the first edge
    e = g[0].edges[0][bb.edge_key(1, 0)]
    e.cns_supp = []
    warns = []
    n = get_assembly(g, contigs, str(tmp_path), warn=warns.append)
    recs = list(cio.read_fastx(str(tmp_path / "asm.final.fa")))
    assert n == 2 and len(recs) == 2
    assert recs[0].seq == seqs[0]
    assert recs[1].seq == seqs[1] + "CCCC" + seqs[2]
    assert warns  # warning issued


def test_singleton_branch_node_emitted(tmp_path):
    """A node branching on both sides is emitted as a singleton contig
    (Assemble.cpp:766-771)."""
    seqs = ["AAACCC", "GGGTTT", "ACACAC", "TGTGTG", "CCCGGG"]
    contigs = ContigStore()
    for s in seqs:
        contigs.add(s, 10, 30.0)
    g = [bb.BBGNode(contig_id=i) for i in range(5)]

    def link(n1, r1, n2, r2):
        e1 = g[n1].edges[r1].get_or_create(bb.edge_key(n2, r2))
        e2 = g[n2].edges[1 - r2].get_or_create(bb.edge_key(n1, 1 - r1))
        for lid in range(4):
            e1.edge_supp.append(bb.EdgeSupp(lid, 0, 0, 1))
            e2.edge_supp.append(bb.EdgeSupp(lid, 1, 1, 0))

    # node 0 has 2 in and 2 out: must become a singleton
    link(1, 0, 0, 0)
    link(2, 0, 0, 0)
    link(0, 0, 3, 0)
    link(0, 0, 4, 0)
    paths = extract_all_simple_paths(g)
    singleton = [p for p in paths if len(p) == 1 and p[0][0] == 0]
    assert singleton
