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


def _mk_graph(edges, n_nodes):
    from haslr_tpu.assemble import backbone as bb

    g = [bb.BBGNode(contig_id=i) for i in range(n_nodes)]
    for (n1, r1, n2, r2) in edges:
        bb.add_edge_with_supp(
            g, n1, r1, n2, r2, [bb.EdgeSupp(0, 0, 0, 1)]
        )
    return g


def test_merge_bridged_paths_through_repeat_node():
    """Reads traversing path A -> repeat node -> path B merge the two
    simple paths through the route; the repeat singleton is absorbed."""
    from haslr_tpu.assemble import stitch
    from haslr_tpu.assemble.repeat import merge_bridged_paths

    # 0->1->2->3->4 plus 5->2->6: node 2 is a branch-both-sides repeat
    g = _mk_graph(
        [(0, 0, 1, 0), (1, 0, 2, 0), (2, 0, 3, 0), (3, 0, 4, 0),
         (5, 0, 2, 0), (2, 0, 6, 0)],
        7,
    )
    paths = stitch.extract_all_simple_paths(g)
    as_lists = sorted(tuple(p) for p in paths)
    assert ((0, 0), (1, 0)) in as_lists
    assert ((3, 0), (4, 0)) in as_lists
    assert ((2, 0),) in as_lists

    chains = [chain((0, 0), (1, 0), (2, 0), (3, 0), (4, 0))
              for _ in range(3)]
    merged = merge_bridged_paths(g, paths, chains, min_support=2)
    tups = sorted(tuple(p) for p in merged)
    assert ((0, 0), (1, 0), (2, 0), (3, 0), (4, 0)) in tups
    # the repeat singleton was absorbed into the route
    assert ((2, 0),) not in tups
    # unrelated singletons survive
    assert ((5, 0),) in tups or ((5, 1),) in tups
    assert ((6, 0),) in tups or ((6, 1),) in tups


def test_merge_bridged_paths_respects_support_and_orientation():
    from haslr_tpu.assemble import stitch
    from haslr_tpu.assemble.repeat import merge_bridged_paths

    g = _mk_graph(
        [(0, 0, 1, 0), (1, 0, 2, 0), (2, 0, 3, 0), (3, 0, 4, 0),
         (5, 0, 2, 0), (2, 0, 6, 0)],
        7,
    )
    paths = stitch.extract_all_simple_paths(g)
    # one read is below min_support: no merge happens
    chains = [chain((0, 0), (1, 0), (2, 0), (3, 0), (4, 0))]
    merged = merge_bridged_paths(g, paths, chains, min_support=2)
    assert sorted(tuple(p) for p in merged) == sorted(
        tuple(p) for p in paths
    )
    # reverse-complement reads support the same canonical bridge
    chains = [chain((4, 1), (3, 1), (2, 1), (1, 1), (0, 1))
              for _ in range(2)]
    merged = merge_bridged_paths(g, paths, chains, min_support=2)
    tups = [tuple(p) for p in merged]
    assert (
        ((0, 0), (1, 0), (2, 0), (3, 0), (4, 0)) in tups
        or ((4, 1), (3, 1), (2, 1), (1, 1), (0, 1)) in tups
    )


def test_merge_bridged_paths_rejects_missing_route_edge():
    from haslr_tpu.assemble import stitch
    from haslr_tpu.assemble.repeat import merge_bridged_paths

    # no 2->3 edge: the claimed route does not exist in the graph
    g = _mk_graph(
        [(0, 0, 1, 0), (1, 0, 2, 0), (3, 0, 4, 0), (5, 0, 2, 0),
         (2, 0, 6, 0)],
        7,
    )
    paths = stitch.extract_all_simple_paths(g)
    chains = [chain((0, 0), (1, 0), (2, 0), (3, 0), (4, 0))
              for _ in range(3)]
    merged = merge_bridged_paths(g, paths, chains, min_support=2)
    assert sorted(len(p) for p in merged) == sorted(len(p) for p in paths)
