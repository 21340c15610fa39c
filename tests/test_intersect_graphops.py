"""Set-intersection / bitset ops and graph algorithms (the live
equivalents of the reference's dead utility layer, SURVEY.md §2.1)."""

import numpy as np
import pytest

from gnnpe_tpu.graph.ops import (bfs_order, bipartite_match,
                                 connected_components, core_order,
                                 dfs_order)
from gnnpe_tpu.ops import intersect as it


@pytest.fixture
def sets():
    rng = np.random.RandomState(0)
    a = np.unique(rng.randint(0, 1000, 200))
    b = np.unique(rng.randint(0, 1000, 400))
    return a, b


def test_intersect_host_forms_agree(sets):
    a, b = sets
    want = np.intersect1d(a, b)
    np.testing.assert_array_equal(it.intersect_sorted_np(a, b), want)
    np.testing.assert_array_equal(it.intersect_auto_np(a, b), want)
    assert it.intersect_count_np(a, b) == len(want)
    # skewed sizes hit the galloping branch
    small = a[:4]
    np.testing.assert_array_equal(it.intersect_auto_np(small, b),
                                  np.intersect1d(small, b))


def test_intersect_device_mask(sets):
    import jax.numpy as jnp
    a, b = sets
    want = set(np.intersect1d(a, b).tolist())
    n, m = 256, 512
    ap = np.full(n, 2**31 - 1, np.int32); ap[:len(a)] = a
    bp = np.full(m, 2**31 - 1, np.int32); bp[:len(b)] = b
    av = np.arange(n) < len(a)
    bv = np.arange(m) < len(b)
    mask = np.asarray(it.intersect_mask(
        jnp.asarray(ap), jnp.asarray(av), jnp.asarray(bp),
        jnp.asarray(bv)))
    assert set(ap[mask].tolist()) == want
    vals, valid = it.intersect_sorted_device(
        jnp.asarray(ap), jnp.asarray(av), jnp.asarray(bp),
        jnp.asarray(bv))
    got = np.asarray(vals)[np.asarray(valid)]
    assert set(got.tolist()) == want
    assert (np.diff(got) > 0).all()      # order preserved


def test_bitset_roundtrip_and_ops(sets):
    a, b = sets
    ba = it.bitset_from_ids(a, 1000)
    bb = it.bitset_from_ids(b, 1000)
    np.testing.assert_array_equal(it.bitset_to_ids(ba), a)
    inter = it.bitset_to_ids(np.asarray(it.bitset_and(ba, bb)))
    np.testing.assert_array_equal(inter, np.intersect1d(a, b))
    assert int(it.bitset_count(ba)) == len(a)
    import jax.numpy as jnp
    ids = jnp.asarray(np.arange(0, 1000, 7).astype(np.int32))
    got = np.asarray(it.array_and_bitset(
        ids, jnp.ones(len(ids), dtype=bool), jnp.asarray(bb)))
    want = np.isin(np.arange(0, 1000, 7), b)
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------

def test_bfs_dfs_orders(query_graph):
    order, parent = bfs_order(query_graph, root=0)
    assert sorted(order.tolist()) == list(range(8))
    pos = {int(v): i for i, v in enumerate(order)}
    for v in range(8):
        if parent[v] >= 0:
            assert pos[int(parent[v])] < pos[v]
            assert query_graph.has_edge(np.array([v]),
                                        np.array([parent[v]]))[0]
    d = dfs_order(query_graph, root=0)
    assert sorted(d.tolist()) == list(range(8))
    assert d[0] == 0


def test_core_order_and_components(data_graph):
    co = core_order(data_graph)
    assert len(co) == data_graph.num_vertices
    core = data_graph.k_core()
    assert (np.diff(core[co]) <= 0).all()
    comp = connected_components(data_graph)
    assert comp.min() == 0
    # vertices joined by an edge share a component
    src, dst = data_graph.coo()
    assert (comp[src] == comp[dst]).all()


def test_bipartite_match_perfect_and_deficient():
    # 3x3 perfect matching exists
    adj = [np.array([0, 1]), np.array([1, 2]), np.array([0, 2])]
    m = bipartite_match(adj, 3)
    assert (m >= 0).all() and len(set(m.tolist())) == 3
    for i, j in enumerate(m):
        assert j in adj[i]
    # deficient: two lefts fight over one right
    adj2 = [np.array([0]), np.array([0]), np.array([1])]
    m2 = bipartite_match(adj2, 2)
    assert (m2 >= 0).sum() == 2
    # augmenting path required: greedy seed gives 0→0, then 1 needs 0;
    # augment moves 0→1 … construct the classic chain
    adj3 = [np.array([0, 1]), np.array([0])]
    m3 = bipartite_match(adj3, 2)
    assert (m3 >= 0).all() and m3[1] == 0 and m3[0] == 1
