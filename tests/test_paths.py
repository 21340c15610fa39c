"""Path-enumeration parity tests vs the reference DFS (custom.h:66-119)."""

import gzip

import numpy as np

from gnnpe_tpu.graph.partition import degree_sorted_nodes
from gnnpe_tpu.paths.enumerate import (dedup_orientations, enumerate_paths,
                                       enumerate_paths_from)

from .conftest import GOLDEN


def test_path_set_exact_parity(data_graph, golden_paths):
    """415,545 deduped 3-vertex paths, identical ids AND order."""
    order = degree_sorted_nodes(data_graph)
    paths, _ = enumerate_paths(data_graph, order, 3, dedup=True)
    assert paths.shape == golden_paths.shape
    assert np.array_equal(paths.astype(np.int64), golden_paths)


def test_partition_lists_exact(data_graph, golden_paths):
    order = degree_sorted_nodes(data_graph)
    # Reproduce the fixture membership: node % 5 (round robin by id).
    membership = np.arange(data_graph.num_vertices) % 5
    _, parts = enumerate_paths(data_graph, order, 3, dedup=True,
                               membership=membership)
    for pid in range(5):
        tok = gzip.open(GOLDEN / f"partition_paths_{pid}.txt.gz",
                        "rt").read().split()
        golden = np.array(tok[1:], dtype=np.int64)
        assert np.array_equal(parts[pid], golden), pid


def test_simple_path_constraint(data_graph):
    order = degree_sorted_nodes(data_graph)[:100]
    rows = enumerate_paths_from(data_graph, order, 4)
    # no repeated vertex within a row
    for j in range(4):
        for k in range(j + 1, 4):
            assert (rows[:, j] != rows[:, k]).all()


def test_dedup_keeps_first_orientation():
    paths = np.array([
        [0, 1, 2],   # rank 0 — kept
        [3, 4, 5],   # rank 1 — kept
        [2, 1, 0],   # rank 2 — reverse of rank 0, dropped
        [5, 4, 3],   # rank 3 — reverse of rank 1, dropped
        [6, 7, 8],   # rank 4 — kept
    ], dtype=np.int32)
    keep = dedup_orientations(paths)
    assert list(keep) == [0, 1, 4]


def test_streaming_dedup_equals_sort_oracle(data_graph):
    """The O(P) endpoint-rank rule == the sort-based oracle on the full
    Test/ enumeration and on a random graph (any chunking too, since
    the rule is row-local)."""
    from gnnpe_tpu.paths.enumerate import (dedup_orientations_streaming,
                                           start_ranks)
    order = degree_sorted_nodes(data_graph)
    rows = enumerate_paths_from(data_graph, order, 3)
    want = np.zeros(len(rows), dtype=bool)
    want[dedup_orientations(rows)] = True
    rank = start_ranks(order, data_graph.num_vertices)
    got = dedup_orientations_streaming(rows, rank)
    assert np.array_equal(got, want)
    # Row-local: any chunk agrees with its slice of the full mask.
    got_chunk = dedup_orientations_streaming(rows[1000:9000], rank)
    assert np.array_equal(got_chunk, want[1000:9000])


def test_pge_no_dedup_counts(data_graph):
    """PGE enumerates both orientations: every edge twice for L=2."""
    order = degree_sorted_nodes(data_graph)
    p2, _ = enumerate_paths(data_graph, order, 2, dedup=False)
    assert p2.shape[0] == 2 * data_graph.num_edges


def test_query_paths(query_graph):
    qpaths, _ = enumerate_paths(query_graph, np.arange(8), 3, dedup=True)
    # 8-vertex, 7-edge tree: reference enumerates these once per
    # orientation; dedup keeps one each.
    rev = qpaths[:, ::-1]
    joined = {tuple(r) for r in qpaths.tolist()}
    assert not any(tuple(r) in joined for r in rev.tolist()
                   if tuple(r) != tuple(r[::-1]) and
                   tuple(r) in joined and tuple(r[::-1]) in joined)


def test_device_enumeration_exact_order(data_graph):
    """Device (jit) enumerator emits the same paths in the same order
    as the host enumerator, including under forced overflow splits."""
    from gnnpe_tpu.graph.partition import degree_sorted_nodes
    from gnnpe_tpu.paths.device_enumerate import enumerate_paths_device
    from gnnpe_tpu.paths.enumerate import enumerate_paths_from
    order = degree_sorted_nodes(data_graph)[:800]
    want = enumerate_paths_from(data_graph, order, 3)
    got = enumerate_paths_device(data_graph, order, 3, cap=1 << 15)
    np.testing.assert_array_equal(got, want)


def test_offline_pipelined_matches_unpipelined(data_graph):
    """Chunked async offline == monolithic enumeration + embedding."""
    import jax.numpy as jnp
    from gnnpe_tpu.graph.partition import degree_sorted_nodes
    from gnnpe_tpu.ops.mt19937 import label_feature_table
    from gnnpe_tpu.paths.enumerate import enumerate_paths_from
    from gnnpe_tpu.paths.pipeline import offline_pipelined
    from gnnpe_tpu.embed.vde import gen_vde
    order = degree_sorted_nodes(data_graph)[:600]
    table = label_feature_table(data_graph.labels_count, 2)
    paths, pde = offline_pipelined(data_graph, order, 3,
                                   table.astype(np.float32),
                                   chunk_starts=128)
    want_paths = enumerate_paths_from(data_graph, order, 3)
    np.testing.assert_array_equal(paths, want_paths)
    ve = gen_vde(data_graph, 2)
    want_pde = ve.vde[want_paths.reshape(-1)].reshape(
        len(want_paths), -1)
    np.testing.assert_allclose(pde, want_pde, rtol=1e-5, atol=1e-5)
