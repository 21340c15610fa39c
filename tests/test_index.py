"""Packed dominance index tests: equivalence with the flat filter (the
semantic ground truth) and pruning behavior."""

import numpy as np
import pytest

from gnnpe_tpu.config import PEConfig
from gnnpe_tpu.embed.pde import gen_pde, gen_query_pde_table
from gnnpe_tpu.embed.vde import gen_vde
from gnnpe_tpu.index.packed import PackedDominanceIndex
from gnnpe_tpu.match.filter import pe_candidates
from gnnpe_tpu.match.plan import greedy_path_cover
from gnnpe_tpu.paths.enumerate import enumerate_paths
from gnnpe_tpu.graph.partition import degree_sorted_nodes


@pytest.fixture(scope="module")
def built(data_graph, query_graph):
    order = degree_sorted_nodes(data_graph)
    paths, _ = enumerate_paths(data_graph, order, 3, dedup=True)
    ve = gen_vde(data_graph, 2)
    data_pde = gen_pde(ve, paths)
    qv = gen_vde(query_graph, 2)
    qp, _ = enumerate_paths(query_graph, np.arange(8), 3, dedup=True)
    q_pde, weight, _ = gen_query_pde_table(qv, qp)
    plan = greedy_path_cover(qp, weight, 8)
    return data_pde, q_pde, plan


@pytest.mark.parametrize("block_size", [64, 512, 4096])
def test_packed_equals_flat(built, block_size):
    data_pde, q_pde, plan = built
    idx = PackedDominanceIndex.build(data_pde, block_size=block_size)
    got = idx.search(q_pde, plan, 8)
    want = pe_candidates(data_pde, q_pde, plan, 8)
    for a, b in zip(got, want):
        assert np.array_equal(a, b)


def test_block_pruning_is_effective(built):
    data_pde, q_pde, plan = built
    idx = PackedDominanceIndex.build(data_pde, block_size=512)
    mask = idx.query_block_mask(q_pde.pde[plan], q_pde.pde_label[plan],
                                q_pde.degrees[plan])
    # label-majority sort should kill the overwhelming majority of blocks
    frac = mask.sum() / mask.size
    assert frac < 0.10, f"pruning too weak: {frac:.2%} blocks survive"


def test_subset_rows_build(built):
    """Partition-scoped index (rows subset) still matches the flat
    filter restricted to those rows."""
    data_pde, q_pde, plan = built
    rows = np.arange(0, data_pde.num_paths, 3)
    idx = PackedDominanceIndex.build(data_pde, block_size=256, rows=rows)
    got = idx.search(q_pde, plan, 8)
    want = pe_candidates(data_pde, q_pde, plan, 8, data_rows=rows)
    for a, b in zip(got, want):
        assert np.array_equal(a, b)


def test_empty_and_tiny():
    from gnnpe_tpu.embed.pde import PathEmbeddings
    empty = PathEmbeddings(vids=np.zeros((0, 3), np.int32),
                           labels=np.zeros((0, 3), np.int32),
                           degrees=np.zeros((0, 3), np.int32),
                           pde=np.zeros((0, 6)),
                           pde_label=np.zeros((0, 6)))
    idx = PackedDominanceIndex.build(empty)
    one = PathEmbeddings(vids=np.array([[0, 1, 2]], np.int32),
                         labels=np.array([[5, 6, 7]], np.int32),
                         degrees=np.array([[1, 2, 1]], np.int32),
                         pde=np.ones((1, 6)), pde_label=np.ones((1, 6)))
    assert all(len(c) == 0 for c in idx.search(one, np.array([0]), 8))
    idx2 = PackedDominanceIndex.build(one)
    got = idx2.search(one, np.array([0]), 8)
    assert sorted(np.concatenate([c for c in got if len(c)]).tolist()) \
        == [0, 1, 2]


def test_table_index_save_load_roundtrip(tmp_path, data_graph,
                                         query_graph):
    """Table-mode and streamed-mode indexes persist and reload with
    identical candidates (the reference's index.dat resume,
    custom.h:218-234 — ours skips the full enumerate/sort/fold)."""
    from gnnpe_tpu.index.device_packed import DevicePackedPESearch
    from gnnpe_tpu.parallel.mesh import make_mesh
    order = degree_sorted_nodes(data_graph)
    paths, _ = enumerate_paths(data_graph, order, 3, dedup=True)
    vertices = gen_vde(data_graph, 2)
    qv = gen_vde(query_graph, 2)
    qp, _ = enumerate_paths(query_graph, np.arange(8), 3, dedup=True)
    q_pde, weight, _ = gen_query_pde_table(qv, qp)
    plan = greedy_path_cover(qp, weight, 8)
    nq = 8
    mesh = make_mesh(8, axes=("graph",), shape=(8,))
    for resident in (True, False):
        idx = DevicePackedPESearch.build_from_paths(
            mesh, paths, vertices, block_size=64, resident=resident)
        want = idx.search(q_pde, plan, nq)
        fp = str(tmp_path / f"idx_{resident}.npz")
        idx.save(fp)
        idx2 = DevicePackedPESearch.load(mesh, fp, vertices)
        assert idx2.streamed == (not resident)
        got = idx2.search(q_pde, plan, nq)
        for a, b in zip(want, got):
            np.testing.assert_array_equal(a, b)
    # Disk-tier sidecar path: a memmap-backed table must save to the
    # raw .vids.bin and reload as a read-only memmap, candidates
    # unchanged (the big-table branch that np.savez cannot handle).
    mm_path = tmp_path / "table.bin"
    mm = np.memmap(mm_path, dtype=np.int32, mode="w+",
                   shape=idx._host_vids.shape)
    mm[:] = idx._host_vids
    idx._host_vids = mm
    fp = str(tmp_path / "idx_mm.npz")
    idx.save(fp)
    assert (tmp_path / "idx_mm.npz.vids.bin").exists()
    idx3 = DevicePackedPESearch.load(mesh, fp, vertices)
    assert isinstance(idx3._host_vids, np.memmap)
    got = idx3.search(q_pde, plan, nq)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a, b)
