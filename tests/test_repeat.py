"""Anchor-space repeat-resolution module tests (reference Graph_repeat
equivalents)."""

from dataclasses import dataclass

import numpy as np
import pytest

from haslr_tpu.assemble import repeat


@dataclass
class A:
    t_id: int
    is_rev: int


def chain(*pairs):
    return [A(t, r) for t, r in pairs]


def test_lcs_identical():
    k = [(1, 0), (2, 0), (3, 1)]
    a1, a2, score = repeat.lcs_alignment(k, k)
    assert score == 3 * repeat.LCS_MATCH
    assert a1 == [0, 1, 2]
    assert a2 == [0, 1, 2]


def test_lcs_free_end_gaps():
    k1 = [(1, 0), (2, 0), (3, 0), (4, 0)]
    k2 = [(3, 0), (4, 0), (5, 0), (6, 0)]
    a1, a2, score = repeat.lcs_alignment(k1, k2)
    # two matched anchors, end gaps unpenalized
    assert score == 2 * repeat.LCS_MATCH
    assert repeat.overlap_type(a1, a2) == "dovetail12"


def test_lcs_containment():
    k1 = [(2, 0), (3, 0)]
    k2 = [(1, 0), (2, 0), (3, 0), (4, 0)]
    a1, a2, _ = repeat.lcs_alignment(k1, k2)
    assert repeat.overlap_type(a1, a2) == "contained1"


def test_overlap_graph_paths():
    """Three dovetailing reads chain into one path; a contained read is
    excluded."""
    chains = [
        chain((1, 0), (2, 0), (3, 0)),
        chain((2, 0), (3, 0), (4, 0)),
        chain((3, 0), (4, 0), (5, 0)),
        chain((2, 0), (3, 0)),          # contained in read 0/1
    ]
    g = repeat.build_overlap_graph(chains)
    assert g[3].is_contained
    n_marked = repeat.transitive_reduction(g)
    paths = repeat.extract_read_paths(g)
    assert len(paths) >= 1
    longest = max(paths, key=len)
    ids = [rid for rid, _rev in longest]
    assert ids == [0, 1, 2] or ids == [2, 1, 0]


def test_map_read_to_path():
    ch = chain((2, 0), (3, 0), (4, 0))
    path = [(1, 0), (2, 0), (3, 0), (4, 0), (5, 0)]
    a1, a2, score = repeat.map_read_to_path(ch, path)
    assert score == 3 * repeat.LCS_MATCH
    assert repeat.overlap_type(a1, a2) == "contained1"


def test_bridge_simple_paths():
    """Reads spanning the junction of two paths vote for the join."""
    path_a = [(1, 0), (2, 0), (3, 0)]
    path_b = [(7, 0), (8, 0), (9, 0)]
    # bridging reads need >= 2 anchors on each side of the junction
    bridging = [
        chain((2, 0), (3, 0), (7, 0), (8, 0)),
        chain((2, 0), (3, 0), (7, 0), (8, 0), (9, 0)),
        chain((1, 0), (2, 0), (3, 0), (7, 0), (8, 0)),
    ]
    bridges = repeat.bridge_simple_paths(
        [path_a, path_b], bridging, min_support=2
    )
    assert bridges
    (pa, sa), (pb, sb), n = bridges[0]
    assert (pa, sa) == (0, 1)   # end of path A
    assert (pb, sb) == (1, 0)   # start of path B
    assert n >= 2


def test_overlap_graph_reverse_orientation():
    """A read in opposite orientation still overlaps (rev2=1 LCS)."""
    fwd = chain((1, 0), (2, 0), (3, 0))
    # reverse-complement chain of (2,0),(3,0),(4,0):
    rc = chain((4, 1), (3, 1), (2, 1))
    g = repeat.build_overlap_graph([fwd, rc])
    n_edges = sum(len(n.out) + len(n.out_rev) for n in g)
    assert n_edges >= 2  # edge + twin
