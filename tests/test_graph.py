"""Graph core tests: loader semantics vs reference graph.cpp:163-242."""

import numpy as np
import pytest

from gnnpe_tpu.graph.csr import CSRGraph
from gnnpe_tpu.graph.dynamic import DynamicGraph
from gnnpe_tpu.graph.partition import (degree_sorted_nodes, partition_graph,
                                       edge_cut)


def test_meta_matches_reference_loader(data_graph, golden_meta):
    m = data_graph.meta()
    g = golden_meta["data_graph"]
    assert m["num_vertices"] == g["V"]
    assert m["num_edges"] == g["E"]
    assert m["labels_count"] == g["labels"]
    assert m["max_degree"] == g["max_degree"]
    assert m["max_label_frequency"] == g["max_label_frequency"]


def test_query_graph_meta(query_graph, golden_meta):
    assert query_graph.num_vertices == golden_meta["query_graph"]["V"]
    assert query_graph.num_edges == golden_meta["query_graph"]["E"]


def test_adjacency_sorted(data_graph):
    for v in [0, 1, 100, 3111]:
        nbrs = data_graph.vertex_neighbors(v)
        assert (np.diff(nbrs) > 0).all()


def test_has_edge_vectorized(data_graph):
    src, dst = data_graph.coo()
    sample = np.random.RandomState(0).choice(len(src), 500)
    assert data_graph.has_edge(src[sample], dst[sample]).all()
    # Non-edges: self loops don't exist in the file
    vs = np.arange(50)
    assert not data_graph.has_edge(vs, vs).any()


def test_reverse_index(data_graph):
    for label in [0, 5, 70]:
        vs = data_graph.vertices_with_label(label)
        assert (data_graph.labels[vs] == label).all()
        assert len(vs) == data_graph.label_frequency[label]


def test_nlf(data_graph):
    nlf = data_graph.nlf
    v = 42
    nbrs = data_graph.vertex_neighbors(v)
    expected = np.bincount(data_graph.labels[nbrs],
                           minlength=data_graph.labels_count)
    assert np.array_equal(nlf[v], expected)


def test_roundtrip_graph_file(tmp_path, query_graph):
    p = tmp_path / "q.graph"
    query_graph.to_graph_file(str(p))
    g2 = CSRGraph.from_graph_file(str(p))
    assert np.array_equal(g2.offsets, query_graph.offsets)
    assert np.array_equal(g2.neighbors, query_graph.neighbors)
    assert np.array_equal(g2.labels, query_graph.labels)


def test_degree_sorted_stable(data_graph):
    order = degree_sorted_nodes(data_graph)
    degs = data_graph.degrees[order]
    assert (np.diff(degs) >= 0).all()
    # stability: equal degrees keep ascending id
    for d in [1, 2]:
        ids = order[degs == d]
        assert (np.diff(ids) > 0).all()


def test_partition_strategies(data_graph):
    for strat in ["bfs", "round_robin", "block"]:
        m = partition_graph(data_graph, 5, strategy=strat)
        assert m.min() >= 0 and m.max() < 5
        counts = np.bincount(m, minlength=5)
        assert counts.min() > 0
    # BFS region growing should beat round robin on edge locality
    cut_bfs = edge_cut(data_graph, partition_graph(data_graph, 5, "bfs"))
    cut_rr = edge_cut(data_graph, partition_graph(data_graph, 5,
                                                  "round_robin"))
    assert cut_bfs < cut_rr


def test_dynamic_graph_roundtrip(query_graph):
    dg = DynamicGraph.from_csr(query_graph)
    snap = dg.snapshot()
    assert np.array_equal(snap.neighbors, query_graph.neighbors)
    dg.add_vertex(3)
    dg.add_edge(0, 8)
    dg.remove_edge(0, 1)
    snap2 = dg.snapshot()
    assert snap2.num_vertices == 9
    assert snap2.has_edge(np.array([0]), np.array([8])).all()
    assert not snap2.has_edge(np.array([0]), np.array([1])).any()
    assert len(dg.updates) == 3


def test_kcore_small():
    # triangle + pendant: triangle vertices core 2, pendant core 1
    g = CSRGraph.from_edges(4, np.array([[0, 1], [1, 2], [0, 2], [2, 3]]),
                            np.zeros(4, dtype=np.int64))
    core = g.k_core()
    assert list(core) == [2, 2, 2, 1]


def test_label_adjacency(data_graph):
    """Per-label adjacency slices == filtered neighbor lists
    (ref buildLabelOffset semantics, graph.cpp:125-159)."""
    g = data_graph
    rng = np.random.RandomState(0)
    for v in rng.randint(0, g.num_vertices, 25):
        nbrs = g.vertex_neighbors(v)
        for lab in np.unique(g.labels[nbrs]):
            got = g.neighbors_with_label(int(v), int(lab))
            want = np.sort(nbrs[g.labels[nbrs] == lab])
            np.testing.assert_array_equal(got, want)
        # a label absent from the row yields an empty slice
        absent = [l for l in range(g.labels_count)
                  if l not in set(g.labels[nbrs].tolist())]
        if absent:
            assert len(g.neighbors_with_label(int(v), absent[0])) == 0


def test_multilevel_partitioner_quality():
    """Multilevel (METIS-style) must (a) exactly recover a planted
    8-community SBM cut, (b) beat BFS growing on Test/, (c) respect the
    1.05 balance bound."""
    import numpy as np
    from gnnpe_tpu.graph.csr import CSRGraph
    from gnnpe_tpu.graph.partition import edge_cut, partition_graph
    rng = np.random.RandomState(0)
    k, n = 8, 500
    edges = []
    for c in range(k):
        u = rng.randint(0, n, n * 8) + c * n
        v = rng.randint(0, n, n * 8) + c * n
        edges.append(np.stack([u, v], 1))
    u = rng.randint(0, n * k, n * k // 2)
    v = rng.randint(0, n * k, n * k // 2)
    edges.append(np.stack([u, v], 1))
    e = np.concatenate(edges)
    e = e[e[:, 0] != e[:, 1]]
    g = CSRGraph.from_edges(n * k, e, np.zeros(n * k, np.int64))
    planted = np.arange(n * k) // n
    m = partition_graph(g, k, strategy="multilevel")
    assert edge_cut(g, m) <= int(edge_cut(g, planted) * 1.05)
    assert np.bincount(m).max() <= 1.06 * n

    gt = CSRGraph.from_graph_file("/root/reference/Test/data_graph.graph")
    cut_ml = edge_cut(gt, partition_graph(gt, 5, strategy="multilevel"))
    cut_bfs = edge_cut(gt, partition_graph(gt, 5, strategy="bfs"))
    assert cut_ml < cut_bfs, (cut_ml, cut_bfs)
