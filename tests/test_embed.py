"""Embedding-stage parity tests: mt19937 x, VDE, PDE, PGE path groups.

Golden values were produced by compiling and running the reference
(see tests/golden/GOLDEN.json).
"""

import gzip
import struct

import numpy as np
import pytest

from gnnpe_tpu.embed.pde import gen_pde, gen_query_pde_table, path_groups
from gnnpe_tpu.embed.vde import gen_vde
from gnnpe_tpu.graph.partition import degree_sorted_nodes
from gnnpe_tpu.ops.mt19937 import label_feature_table, label_seeded_x
from gnnpe_tpu.paths.enumerate import enumerate_paths

from .conftest import GOLDEN

VDE_DIM, PDE_DIM = 2, 4


def test_label_seeded_x_bit_exact():
    """480 rows across dims {1,2,4,6,8,16} × labels 0..79, bit-for-bit."""
    rows = 0
    with open(GOLDEN / "vde_x_golden.txt") as f:
        for line in f:
            t = line.split()
            dim, label = int(t[0]), int(t[1])
            golden = np.array([float(v) for v in t[2:]])
            mine = label_seeded_x(label, dim)
            assert np.array_equal(mine, golden), (dim, label)
            rows += 1
    assert rows == 480


def test_x_positive_and_normalized():
    for label in range(50):
        x = label_seeded_x(label, 6)
        assert (x > 0).all()
        assert abs(x.sum() - 1.0) < 1e-12


@pytest.fixture(scope="module")
def pge_bin_arrays(data_graph):
    """Parse data_vertices.bin (layout: GNN-PGE/src/main.cpp:179-194)."""
    v = data_graph.num_vertices
    raw = open(GOLDEN / "data_vertices_pge.bin", "rb").read()
    count = struct.unpack("<I", raw[:4])[0]
    assert count == v
    rec = 3 * 4 + 8 + VDE_DIM * 8 * 3 + PDE_DIM * 2 * 8 * 2
    arrays = dict(x=np.zeros((v, VDE_DIM)), nx=np.zeros((v, VDE_DIM)),
                  vde=np.zeros((v, VDE_DIM)), pg=np.zeros((v, 2 * PDE_DIM)),
                  plg=np.zeros((v, 2 * PDE_DIM)))
    off = 4
    for _ in range(count):
        b = raw[off:off + rec]
        off += rec
        vid = struct.unpack("<I", b[:4])[0]
        vals = np.frombuffer(b[12:], dtype="<f8")
        arrays["x"][vid] = vals[1:3]
        arrays["nx"][vid] = vals[3:5]
        arrays["vde"][vid] = vals[5:7]
        arrays["pg"][vid] = vals[7:15]
        arrays["plg"][vid] = vals[15:23]
    return arrays


def test_vde_bit_exact(data_graph, pge_bin_arrays):
    ve = gen_vde(data_graph, VDE_DIM)
    assert np.array_equal(ve.x, pge_bin_arrays["x"])
    assert np.array_equal(ve.nx, pge_bin_arrays["nx"])
    assert np.array_equal(ve.vde, pge_bin_arrays["vde"])


def test_pge_path_groups_bit_exact(data_graph, pge_bin_arrays):
    ve = gen_vde(data_graph, VDE_DIM)
    order = degree_sorted_nodes(data_graph)
    p2, _ = enumerate_paths(data_graph, order, 2, dedup=False)
    grp, lgrp = path_groups(ve, p2[:, 0], p2, PDE_DIM)
    v = data_graph.num_vertices
    inter = np.empty((v, 2 * PDE_DIM))
    inter[:, 0::2], inter[:, 1::2] = grp[:, 0], grp[:, 1]
    linter = np.empty((v, 2 * PDE_DIM))
    linter[:, 0::2], linter[:, 1::2] = lgrp[:, 0], lgrp[:, 1]
    assert np.array_equal(inter, pge_bin_arrays["pg"])
    assert np.array_equal(linter, pge_bin_arrays["plg"])


def test_gen_pde_gather(data_graph, golden_paths):
    ve = gen_vde(data_graph, VDE_DIM)
    pe = gen_pde(ve, golden_paths[:1000])
    assert pe.pde.shape == (1000, 6)
    # spot-check row 0 against manual concat
    p0 = golden_paths[0]
    assert np.array_equal(pe.pde[0], ve.vde[p0].ravel())
    assert np.array_equal(pe.pde_label[0], ve.x[p0].ravel())
    assert np.array_equal(pe.labels[0], ve.labels[p0])


def test_query_pde_keys(query_graph):
    ve = gen_vde(query_graph, VDE_DIM)
    qpaths, _ = enumerate_paths(query_graph, np.arange(8), 3, dedup=True)
    pe, weight, key = gen_query_pde_table(ve, qpaths)
    assert np.array_equal(weight, pe.degrees.sum(axis=1))
    assert np.allclose(key, -pe.pde.sum(axis=1))


def test_device_vde_close_to_host(data_graph):
    """f32 device VDE tracks the f64 host parity values."""
    import jax.numpy as jnp
    from gnnpe_tpu.embed.vde import gen_vde_device
    ve = gen_vde(data_graph, VDE_DIM)
    table = label_feature_table(data_graph.labels_count, VDE_DIM)
    offs, nbrs, labels, _ = data_graph.device_arrays()
    x, nx, vde = gen_vde_device(offs, nbrs, labels,
                                jnp.asarray(table, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(vde), ve.vde, rtol=2e-5)


def test_path_groups_device_bit_exact(data_graph):
    """Streaming device rank-space fold == host f64 fold, bit-exact
    (PGE leaf compares are strict f64 — the rank trick preserves order
    exactly; GNN-PGE/src/main.cpp:95-177)."""
    from gnnpe_tpu.embed.pde import path_groups, path_groups_device
    from gnnpe_tpu.graph.partition import degree_sorted_nodes
    ve = gen_vde(data_graph, VDE_DIM)
    order = degree_sorted_nodes(data_graph)
    paths, _ = enumerate_paths(data_graph, order, 2, dedup=False)
    want_g, want_lg = path_groups(ve, paths[:, 0], paths, 4)
    got_g, got_lg = path_groups_device(ve, data_graph, order, 2, 4,
                                       chunk_starts=500)
    assert np.array_equal(want_g, got_g)
    assert np.array_equal(want_lg, got_lg)


def test_pge_engine_device_offline_parity(data_graph, query_graph):
    """PGE engine with device-streamed group fold answers 221,832."""
    from gnnpe_tpu.config import PGEConfig
    from gnnpe_tpu.engine import PGEEngine
    eng = PGEEngine(PGEConfig.from_cli(l=2, e=2, p=5),
                    data_graph).offline(device=True)
    r = eng.online(query_graph, engine="python")
    assert r.answer_count == 221832
