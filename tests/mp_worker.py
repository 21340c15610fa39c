"""Worker for the multi-process distributed test (run via subprocess).

Each of 2 processes owns 4 virtual CPU devices; jax.distributed
coordinates them into one 8-device runtime.  The worker runs ONE
distributed train step and ONE halo aggregation over the GLOBAL mesh
and prints scalars for the parent test to compare — this is the
DCN/multi-host story of SURVEY.md §2.3 exercised for real (two OS
processes, grpc collectives), not just virtual-device shard_map.

Usage: python mp_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from __graft_entry__ import _toy_graph  # noqa: E402
from gnnpe_tpu.models.gnn import PathGNN  # noqa: E402
from gnnpe_tpu.parallel.dist import (make_distributed_train_step,  # noqa
                                     replicate, shard_along, shard_edges)
from gnnpe_tpu.parallel.halo import HaloPlan  # noqa: E402
from gnnpe_tpu.parallel.mesh import make_mesh, maybe_distributed_init  # noqa
from gnnpe_tpu.graph.partition import partition_graph  # noqa: E402

assert len(jax.devices()) == 4 * nproc, jax.devices()
assert len(jax.local_devices()) == 4

g = _toy_graph(num_vertices=48, num_labels=6, seed=3)
mesh = make_mesh(4 * nproc, axes=("graph", "batch"),
                 shape=(4 * nproc, 1))

model = PathGNN(dim=8, num_layers=2, labels_count=6,
                activation="softplus")
params = model.init(jax.random.key(0), labels_count=6)
opt = optax.adam(1e-3)
src, dst = g.coo()
ss, ds = shard_edges(src, dst, mesh.shape["graph"])
rng = np.random.RandomState(0)
paths = rng.randint(0, g.num_vertices, (8, 3)).astype(np.int32)
pairs = rng.randint(0, 8, (8, 2)).astype(np.int32)
step = make_distributed_train_step(model, mesh, opt, g.num_vertices)
out = step(replicate(mesh, params),
           replicate(mesh, jnp.asarray(g.labels)),
           shard_along(mesh, jnp.asarray(ss), "graph"),
           shard_along(mesh, jnp.asarray(ds), "graph"),
           shard_along(mesh, jnp.asarray(paths), "batch"),
           shard_along(mesh, jnp.asarray(pairs), "batch"),
           replicate(mesh, opt.init(params)))
print(f"LOSS {float(out[2]):.10f}", flush=True)

# Halo aggregation over the same global mesh ("graph" axis size 8).
hmesh = make_mesh(4 * nproc, axes=("graph",), shape=(4 * nproc,))
membership = partition_graph(g, 4 * nproc)
plan = HaloPlan.build(g.offsets, g.neighbors, membership, 4 * nproc)
agg = plan.make_aggregate(hmesh)
x = np.random.RandomState(0).rand(g.num_vertices, 8).astype(np.float32)
shards = plan.shard_features(x)
out_sh = agg(shard_along(hmesh, jnp.asarray(shards), "graph"))
# Global checksum via an on-device reduction (pad rows are exact
# zeros, so this equals the checksum of the dense aggregation).
checksum = float(jax.jit(lambda a: jnp.abs(a).sum())(out_sh))
print(f"HALO {checksum:.6f}", flush=True)

# Binned-halo (production scatter-free) aggregation, same mesh.
from gnnpe_tpu.parallel.binned_halo import BinnedHaloPlan  # noqa: E402
bplan = BinnedHaloPlan.build(g.offsets, g.neighbors, membership,
                             4 * nproc)
bagg = bplan.make_aggregate(hmesh)
bout = bagg(shard_along(hmesh, jnp.asarray(bplan.shard_features(x)),
                        "graph"))
# Checksum over REAL rows only (pad rows carry ~1e-5 float junk that
# is never read by consumers; exclude it from the cross-run compare).
rows = jnp.asarray(bplan.row_of_vertex())
bsum = float(jax.jit(
    lambda a, r: jnp.abs(jnp.take(a.reshape(-1, a.shape[-1]), r,
                                  axis=0)).sum())(bout, rows))
print(f"BINNED {bsum:.6f}", flush=True)
jax.distributed.shutdown()
