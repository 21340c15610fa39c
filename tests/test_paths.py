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


def test_offline_build_pipelined_equals_sequential(data_graph):
    """Pipelined enumerate→key→dedup→build (paths/pipeline.py) must
    produce the identical index (vids layout and summaries) and the
    identical candidate sets as the sequential stage."""
    import jax
    from gnnpe_tpu.config import PEConfig
    from gnnpe_tpu.embed.vde import gen_vde
    from gnnpe_tpu.embed.pde import gen_query_pde_table
    from gnnpe_tpu.graph.partition import degree_sorted_nodes
    from gnnpe_tpu.index.device_packed import DevicePackedPESearch
    from gnnpe_tpu.io.datasets import sample_query
    from gnnpe_tpu.match.plan import greedy_path_cover
    from gnnpe_tpu.parallel.mesh import make_mesh
    from gnnpe_tpu.paths.enumerate import enumerate_paths
    from gnnpe_tpu.paths.pipeline import offline_build_pipelined

    cfg = PEConfig.from_cli(l=2, e=2, p=5)
    order = degree_sorted_nodes(data_graph)
    vertices = gen_vde(data_graph, cfg.vde_dim)
    mesh = make_mesh(1, axes=("graph",), shape=(1,))

    seq_paths, _ = enumerate_paths(data_graph, order, cfg.path_length,
                                   dedup=True)
    seq_idx = DevicePackedPESearch.build_from_paths(
        mesh, seq_paths, vertices, block_size=512)

    pip_paths, pip_idx, timings = offline_build_pipelined(
        data_graph, order, cfg.path_length, vertices, mesh,
        block_size=512, chunk_starts=777)    # odd chunk on purpose
    np.testing.assert_array_equal(pip_paths, seq_paths)
    np.testing.assert_array_equal(pip_idx._host_vids,
                                  seq_idx._host_vids)
    np.testing.assert_array_equal(np.asarray(pip_idx.b_deg),
                                  np.asarray(seq_idx.b_deg))
    assert timings["total_s"] > 0

    q = sample_query(data_graph, 8, tree=True, seed=3)
    qv = gen_vde(q, cfg.vde_dim)
    qp, _ = enumerate_paths(q, np.arange(q.num_vertices),
                            cfg.path_length, dedup=True)
    q_pde, w, _ = gen_query_pde_table(qv, qp)
    plan = greedy_path_cover(qp, w, q.num_vertices)
    a = seq_idx.search(q_pde, plan, q.num_vertices)
    b = pip_idx.search(q_pde, plan, q.num_vertices)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_pipeline_l1_fast_path_matches_sequential(data_graph):
    """The l=1 fast path (paths = the oriented arc list, no expansion
    loop) must emit the SAME rows in the SAME enumeration order as the
    generic chunked pipeline and the sequential enumerator."""
    from gnnpe_tpu.config import PEConfig
    from gnnpe_tpu.embed.vde import gen_vde
    from gnnpe_tpu.graph.partition import degree_sorted_nodes
    from gnnpe_tpu.parallel.mesh import make_mesh
    from gnnpe_tpu.paths.pipeline import offline_build_pipelined

    cfg = PEConfig.from_cli(l=1, e=2, p=5)
    order = degree_sorted_nodes(data_graph)
    vertices = gen_vde(data_graph, cfg.vde_dim)
    mesh = make_mesh(1, axes=("graph",), shape=(1,))
    seq_paths, _ = enumerate_paths(data_graph, order, cfg.path_length,
                                   dedup=True)
    pip_paths, pip_idx, _ = offline_build_pipelined(
        data_graph, order, cfg.path_length, vertices, mesh,
        block_size=512)
    np.testing.assert_array_equal(pip_paths, seq_paths)


def test_bucketed_streamed_build_bit_identical(data_graph, tmp_path,
                                               monkeypatch):
    """The bucketed out-of-core streamed build (index/bucket_build.py)
    must produce a sorted leaf table, sig ranges, and block summaries
    BIT-IDENTICAL to the monolithic streamed build_from_paths — in
    RAM mode, with a forced memmap table, and with forced disk spill
    (VERDICT r4 items 2/3)."""
    from gnnpe_tpu.config import PEConfig
    from gnnpe_tpu.embed.vde import gen_vde
    from gnnpe_tpu.graph.partition import degree_sorted_nodes
    from gnnpe_tpu.index.device_packed import DevicePackedPESearch
    from gnnpe_tpu.parallel.mesh import make_mesh
    from gnnpe_tpu.paths.pipeline import offline_build_pipelined

    cfg = PEConfig.from_cli(l=2, e=2, p=5)
    order = degree_sorted_nodes(data_graph)
    vertices = gen_vde(data_graph, cfg.vde_dim)
    mesh = make_mesh(1, axes=("graph",), shape=(1,))
    seq_paths, _ = enumerate_paths(data_graph, order, cfg.path_length,
                                   dedup=True)
    ref = DevicePackedPESearch.build_from_paths(
        mesh, seq_paths, vertices, block_size=512, resident=False)

    def check(idx, paths):
        assert idx.streamed and idx.d_vids is None
        np.testing.assert_array_equal(np.asarray(idx._host_vids),
                                      ref._host_vids)
        np.testing.assert_array_equal(paths,
                                      ref._host_vids[:len(seq_paths)])
        np.testing.assert_array_equal(idx._blk_sig_first,
                                      ref._blk_sig_first)
        np.testing.assert_array_equal(idx._blk_sig_last,
                                      ref._blk_sig_last)
        np.testing.assert_array_equal(np.asarray(idx.b_deg),
                                      np.asarray(ref.b_deg))
        np.testing.assert_array_equal(np.asarray(idx.b_ub3[0]),
                                      np.asarray(ref.b_ub3[0]))
        np.testing.assert_array_equal(np.asarray(idx.b_llo3[0]),
                                      np.asarray(ref.b_llo3[0]))
        np.testing.assert_array_equal(np.asarray(idx.b_lhi3[0]),
                                      np.asarray(ref.b_lhi3[0]))

    monkeypatch.setenv("GNNPE_SPILL_DIR", str(tmp_path))
    # RAM-mode buckets, RAM table.
    paths, idx, tim = offline_build_pipelined(
        data_graph, order, cfg.path_length, vertices, mesh,
        block_size=512, chunk_starts=777, resident=False)
    assert tim["mode"] == "streamed" and tim["n_buckets"] >= 8
    assert not tim["spilled_to_disk"] and not tim["table_memmap"]
    check(idx, paths)
    # Forced memmap table.
    monkeypatch.setenv("GNNPE_FORCE_MEMMAP", "1")
    paths, idx, tim = offline_build_pipelined(
        data_graph, order, cfg.path_length, vertices, mesh,
        block_size=512, chunk_starts=777, resident=False)
    assert tim["table_memmap"]
    assert isinstance(idx._host_vids, np.memmap)
    check(idx, paths)
    # Forced disk spill (tiny RAM budget) + memmap.
    monkeypatch.setenv("GNNPE_HOST_RAM_BYTES", "1000")
    paths, idx, tim = offline_build_pipelined(
        data_graph, order, cfg.path_length, vertices, mesh,
        block_size=512, chunk_starts=777, resident=False)
    assert tim["spilled_to_disk"] and tim["table_memmap"]
    check(idx, paths)
    # The bucketed index must serve queries identically too.
    from gnnpe_tpu.embed.pde import gen_query_pde_table
    from gnnpe_tpu.io.datasets import sample_query
    from gnnpe_tpu.match.plan import greedy_path_cover
    q = sample_query(data_graph, 8, tree=True, seed=3)
    qv = gen_vde(q, cfg.vde_dim)
    qp, _ = enumerate_paths(q, np.arange(q.num_vertices),
                            cfg.path_length, dedup=True)
    q_pde, w, _ = gen_query_pde_table(qv, qp)
    plan = greedy_path_cover(qp, w, q.num_vertices)
    a = ref.search(q_pde, plan, q.num_vertices)
    c = idx.search(q_pde, plan, q.num_vertices)
    for x, y in zip(a, c):
        np.testing.assert_array_equal(x, y)
    # close() must unlink the build-temp disk-tier table (50 GB per
    # run at the youtube_skew rung must not accumulate).
    import os
    tp = idx._owned_table_path
    assert tp is not None and os.path.exists(tp)
    idx.close()
    assert not os.path.exists(tp)


def test_capacity_model_auto_streams(data_graph, monkeypatch):
    """With a tiny HBM budget the pipeline must auto-select streamed
    mode and still build a searchable index (the capacity seam of the
    HBM-wall feature)."""
    from gnnpe_tpu.config import PEConfig
    from gnnpe_tpu.embed.vde import gen_vde
    from gnnpe_tpu.parallel.mesh import make_mesh
    from gnnpe_tpu.paths.pipeline import offline_build_pipelined
    monkeypatch.setenv("GNNPE_HBM_BYTES", "1000")   # ~1 KB budget
    cfg = PEConfig.from_cli(l=2, e=2, p=5)
    order = degree_sorted_nodes(data_graph)
    vertices = gen_vde(data_graph, cfg.vde_dim)
    mesh = make_mesh(1, axes=("graph",), shape=(1,))
    paths, idx, tim = offline_build_pipelined(
        data_graph, order, cfg.path_length, vertices, mesh)
    assert tim["mode"] == "streamed" and idx.streamed
    assert idx.d_vids is None
