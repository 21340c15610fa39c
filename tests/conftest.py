"""Test configuration.

Forces the CPU backend with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (the reference has no
distributed test story at all — SURVEY.md §4; this is the TPU-era
substitute).  Must run before jax is imported anywhere.
"""

import os

# The environment ships JAX_PLATFORMS=axon (remote-TPU tunnel; seconds
# of latency per dispatch) and the axon plugin re-forces itself during
# registration, so overwrite the env AND the config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
# Deterministic hub economics in tests: use the fallback table, not
# the per-machine micro-probe (utils/device_probe.py).
os.environ["GNNPE_NO_PROBE"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

# Persistent XLA compilation cache: compiles on this box take ~12s per
# op, so cache aggressively across test runs.
_cache = pathlib.Path(__file__).parent.parent / ".cache" / "jax"
_cache.mkdir(parents=True, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_cache))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"
TEST_DATA = pathlib.Path("/root/reference/Test")


@pytest.fixture(scope="session")
def data_graph():
    from gnnpe_tpu.graph.csr import CSRGraph
    return CSRGraph.from_graph_file(str(TEST_DATA / "data_graph.graph"))


@pytest.fixture(scope="session")
def query_graph():
    from gnnpe_tpu.graph.csr import CSRGraph
    return CSRGraph.from_graph_file(str(TEST_DATA / "query_graph.graph"))


@pytest.fixture(scope="session")
def golden_meta():
    import json
    with open(GOLDEN / "GOLDEN.json") as f:
        return json.load(f)


@pytest.fixture(scope="session")
def golden_paths():
    import gzip
    tok = gzip.open(GOLDEN / "all_paths_l2.txt.gz", "rt").read().split()
    n = int(tok[0])
    return np.array(tok[1:], dtype=np.int64).reshape(n, 3)


def load_candidates(name):
    """Parse a candidates dump fixture → list[set[int]] per query vertex."""
    import gzip
    out = []
    with gzip.open(GOLDEN / name, "rt") as f:
        for line in f:
            t = line.split()
            assert int(t[0]) == len(out)
            out.append(set(map(int, t[2:])))
    return out
