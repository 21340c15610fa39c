"""CLI front-end and artifact-store tests."""

import os
import subprocess
import sys

import numpy as np
import pytest

from gnnpe_tpu.io.artifacts import ArtifactStore
from gnnpe_tpu.config import PEConfig, PGEConfig

TEST_DIR = "/root/reference/Test/"


def run_cli(args, **kw):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, "-m", "gnnpe_tpu.frontends.cli"] + args,
        capture_output=True, text=True, env=env, **kw)


@pytest.mark.parametrize("variant,expect", [("pe", "45426"),
                                            ("pge", "221832")])
def test_cli_end_to_end(tmp_path, variant, expect):
    wd = str(tmp_path / variant)
    r = run_cli(["-f", TEST_DIR, "-m", "offline", "--variant", variant,
                 "--workdir", wd])
    assert r.returncode == 0, r.stderr
    r = run_cli(["-f", TEST_DIR, "-m", "online", "--variant", variant,
                 "--workdir", wd])
    assert r.returncode == 0, r.stderr
    assert expect in r.stdout


def test_cli_answer_limit(tmp_path):
    wd = str(tmp_path / "lim")
    r = run_cli(["-f", TEST_DIR, "-m", "online", "--variant", "pge",
                 "-n", "100", "--workdir", wd])
    assert r.returncode == 0, r.stderr
    assert "Answer Num: 100" in r.stdout


def test_artifact_fingerprint_isolation(tmp_path):
    store = ArtifactStore(str(tmp_path))
    ds = TEST_DIR + "data_graph.graph"
    fp1 = store.fingerprint(PEConfig.from_cli(l=2), ds)
    fp2 = store.fingerprint(PEConfig.from_cli(l=3), ds)
    fp3 = store.fingerprint(PGEConfig.from_cli(l=2), ds)
    assert len({fp1, fp2, fp3}) == 3, "configs must not share artifacts"
    store.save("paths", fp1, paths=np.arange(6).reshape(2, 3))
    assert store.has("paths", fp1) and not store.has("paths", fp2)
    back = store.load("paths", fp1)
    assert np.array_equal(back["paths"], np.arange(6).reshape(2, 3))


def test_reference_wire_formats_roundtrip(tmp_path):
    store = ArtifactStore(str(tmp_path))
    paths = np.array([[0, 1, 2], [3, 4, 5]], dtype=np.int64)
    p = str(tmp_path / "all_paths.txt")
    store.write_all_paths(p, paths)
    assert np.array_equal(store.read_all_paths(p), paths)


def test_data_vertices_bin_roundtrip(tmp_path, data_graph):
    """Write our arrays in the reference's binary layout and read back
    — also cross-checked against the reference's own file in
    test_embed.py."""
    from gnnpe_tpu.embed.vde import gen_vde
    from gnnpe_tpu.embed.pde import path_groups, path_group_keys
    from gnnpe_tpu.graph.partition import degree_sorted_nodes
    from gnnpe_tpu.paths.enumerate import enumerate_paths
    store = ArtifactStore(str(tmp_path))
    ve = gen_vde(data_graph, 2)
    order = degree_sorted_nodes(data_graph)
    p2, _ = enumerate_paths(data_graph, order, 2, dedup=False)
    grp, lgrp = path_groups(ve, p2[:, 0], p2, 4)
    # Data vertices carry key=0.0 (value-initialized, never set —
    # GNN-PGE/src/main.cpp:179-194); keys are computed only for query
    # vertices (main.cpp:325-329).
    keys = np.zeros(data_graph.num_vertices)
    path = str(tmp_path / "dv.bin")
    store.write_data_vertices_bin(path, 2, 4, ve.labels, ve.degrees,
                                  keys, ve.x, ve.nx, ve.vde, grp, lgrp)
    back = store.read_data_vertices_bin(path, 2, 4)
    assert np.array_equal(back["x"], ve.x)
    assert np.array_equal(back["vde"], ve.vde)
    assert np.array_equal(back["group"], grp)
    assert np.array_equal(back["label_group"], lgrp)
    # byte-compare against the reference binary's own dump
    golden = open("tests/golden/data_vertices_pge.bin", "rb").read()
    mine = open(path, "rb").read()
    assert mine == golden, "binary layout must match the reference"
