"""Backbone graph + cleaning unit tests on hand-built graphs."""

import numpy as np
import pytest

from haslr_tpu.assemble import backbone as bb
from haslr_tpu.assemble import cleaning


def _mk_graph(n):
    return [bb.BBGNode(contig_id=i) for i in range(n)]


def _link(graph, n1, r1, n2, r2, supp=5):
    """Add an edge with `supp` synthetic supporting reads."""
    to1 = bb.edge_key(n2, r2)
    to2 = bb.edge_key(n1, 1 - r1)
    e1 = graph[n1].edges[r1].get_or_create(to1)
    e2 = graph[n2].edges[1 - r2].get_or_create(to2)
    for k in range(supp):
        e1.edge_supp.append(bb.EdgeSupp(k, 0, 0, 1))
        e2.edge_supp.append(bb.EdgeSupp(k, 1, 1, 0))
    return e1


def test_edge_map_ordering():
    m = bb.EdgeMap()
    for k in [9, 3, 7, 1]:
        m.get_or_create(k)
    assert m.keys() == [1, 3, 7, 9]
    assert m.first_key() == 1
    assert m.nth_key(1) == 3
    m.remove(3)
    assert m.keys() == [1, 7, 9]
    assert 3 not in m


def test_add_remove_edge_twin_symmetry():
    g = _mk_graph(3)
    _link(g, 0, 0, 1, 0)
    # twin lives at node1.edges[1] keyed back to node0 reversed
    assert bb.edge_key(1, 0) in g[0].edges[0]
    assert bb.edge_key(0, 1) in g[1].edges[1]
    bb.remove_edge(g, 0, 0, 1, 0)
    assert len(g[0].edges[0]) == 0
    assert len(g[1].edges[1]) == 0


def test_remove_weak_edges():
    g = _mk_graph(4)
    _link(g, 0, 0, 1, 0, supp=5)
    _link(g, 1, 0, 2, 0, supp=2)   # weak
    _link(g, 2, 0, 3, 0, supp=3)
    removed = bb.remove_weak_edges(g, 3)
    assert removed == 1
    assert bb.edge_key(1, 0) in g[0].edges[0]
    assert bb.edge_key(2, 0) not in g[1].edges[0]
    assert bb.edge_key(3, 0) in g[2].edges[0]


def test_simple_path_and_tips():
    # chain 0-1-2-3-4 plus a tip 5 hanging off interior node 2: the tip is
    # the only depth-1 dead end whose far side stays extendable (node 0's
    # own path to the junction is longer than the depth bound)
    g = _mk_graph(6)
    _link(g, 0, 0, 1, 0)
    _link(g, 1, 0, 2, 0)
    _link(g, 2, 0, 3, 0)
    _link(g, 3, 0, 4, 0)
    _link(g, 5, 0, 2, 0)   # tip: 5 -> 2
    removed = cleaning.clean_tips(g, 1, None)
    assert removed == 1
    assert bb.edge_key(2, 0) not in g[5].edges[0]
    # chain intact
    assert bb.edge_key(1, 0) in g[0].edges[0]
    assert bb.edge_key(2, 0) in g[1].edges[0]


def test_tip_at_dead_end_not_removed():
    # 0 -> 1 and nothing else: removing would destroy the only path
    g = _mk_graph(2)
    _link(g, 0, 0, 1, 0)
    removed = cleaning.clean_tips(g, 3, None)
    assert removed == 0


def test_simple_bubble_removed():
    # 0 -> {1,2} -> 3, path through 1 has higher support
    g = _mk_graph(5)
    _link(g, 0, 0, 1, 0, supp=8)
    _link(g, 1, 0, 3, 0, supp=8)
    _link(g, 0, 0, 2, 0, supp=4)
    _link(g, 2, 0, 3, 0, supp=4)
    _link(g, 3, 0, 4, 0, supp=6)
    removed = cleaning.clean_simple_bubbles_old(g, 4, None)
    assert removed == 1
    # low-coverage branch through 2 is gone
    assert bb.edge_key(2, 0) not in g[0].edges[0]
    assert bb.edge_key(3, 0) not in g[2].edges[0]
    # winner intact
    assert bb.edge_key(1, 0) in g[0].edges[0]
    assert bb.edge_key(3, 0) in g[1].edges[0]


def test_super_bubble_three_arms():
    # 0 -> {1,2,3} -> 4 -> 5; keep the best-supported arm
    g = _mk_graph(6)
    _link(g, 0, 0, 1, 0, supp=9)
    _link(g, 1, 0, 4, 0, supp=9)
    _link(g, 0, 0, 2, 0, supp=3)
    _link(g, 2, 0, 4, 0, supp=3)
    _link(g, 0, 0, 3, 0, supp=4)
    _link(g, 3, 0, 4, 0, supp=4)
    _link(g, 4, 0, 5, 0, supp=8)
    removed = cleaning.clean_super_bubbles(g, 50000, None)
    assert removed == 1
    assert bb.edge_key(1, 0) in g[0].edges[0]
    assert bb.edge_key(2, 0) not in g[0].edges[0]
    assert bb.edge_key(3, 0) not in g[0].edges[0]


def test_small_bubble():
    # shortcut 0->2 vs path 0->1->2; shortcut weaker -> removed
    g = _mk_graph(3)
    _link(g, 0, 0, 1, 0, supp=6)
    _link(g, 1, 0, 2, 0, supp=6)
    _link(g, 0, 0, 2, 0, supp=2)
    removed = cleaning.clean_small_bubbles(g, None)
    assert removed == 1
    assert bb.edge_key(2, 0) not in g[0].edges[0]
    assert bb.edge_key(1, 0) in g[0].edges[0]


def test_small_bubble_keeps_shortcut_when_stronger():
    g = _mk_graph(3)
    _link(g, 0, 0, 1, 0, supp=2)
    _link(g, 1, 0, 2, 0, supp=2)
    _link(g, 0, 0, 2, 0, supp=9)
    removed = cleaning.clean_small_bubbles(g, None)
    assert removed == 1
    assert bb.edge_key(2, 0) in g[0].edges[0]
    assert bb.edge_key(1, 0) not in g[0].edges[0]


def test_gfa_and_stats(tmp_path):
    from haslr_tpu.assemble.contig_store import ContigStore

    contigs = ContigStore()
    for i in range(4):
        contigs.add("ACGT" * (10 + i), kmer_count=10, mean_kmer=30.0)
    g = _mk_graph(4)
    _link(g, 0, 0, 1, 0)
    _link(g, 1, 0, 2, 1)
    gfa = tmp_path / "g.gfa"
    bb.write_gfa(g, contigs, str(gfa))
    lines = gfa.read_text().splitlines()
    s_lines = [l for l in lines if l.startswith("S")]
    l_lines = [l for l in lines if l.startswith("L")]
    assert len(s_lines) == 3           # nodes 0,1,2 on edges
    assert len(l_lines) == 4           # 2 undirected edges x 2 twins
    stat = tmp_path / "g.stat"
    bb.general_stats(g, contigs, str(stat))
    txt = stat.read_text()
    assert "nodes: 3" in txt
    assert "edges: 2" in txt
    assert "connected_components: 1" in txt


def test_find_simple_paths2_peels_chain():
    g = _mk_graph(5)
    _link(g, 0, 0, 1, 0)
    _link(g, 1, 0, 2, 0)
    _link(g, 2, 0, 3, 0)
    _link(g, 2, 0, 4, 0)   # branch at node 2
    paths = bb.find_simple_paths2(g)
    # chain 0-1-2 peels first, then 2-3 and 2-4 after the branch frees up
    flat = sorted(tuple(p[0]) + tuple(p[-1]) for p in paths)
    assert len(paths) >= 2
    # all edges consumed
    assert all(len(n.edges[0]) == 0 and len(n.edges[1]) == 0 for n in g)


def test_unique_edges_canonical():
    g = _mk_graph(4)
    _link(g, 0, 0, 1, 0)
    _link(g, 1, 0, 2, 0)
    edges = list(bb.unique_edges(g))
    assert len(edges) == 2
    # canonical order: first encountered from the lowest vertex
    assert (edges[0][0], edges[0][2]) == (0, 1)
    assert (edges[1][0], edges[1][2]) == (1, 2)
