"""Device-side candidate filtering (jit / shard_map).

The flat dominance filter is a dense masked compare — exactly what the
VPU eats (SURVEY.md §7.1.3).  This module runs it on device in f32 with
an **inflated epsilon**: f32 rounding can move values by up to one ulp
of the largest embedding magnitude, so the comparison slack grows
accordingly.  The result is a guaranteed *superset* of the exact-f64
candidate set; refinement only extends from candidate sets through full
edge checks, so the final match count is unchanged for the exact (PGE)
semantics.  Strict PE parity mode keeps the f64 host filter.

Sharded search: data paths split across the mesh's "graph" axis, each
device computes its mask shard, results concatenate — the TPU analogue
of the reference's per-partition OpenMP search + serial union
(GNN-PE/src/main.cpp:155-172).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np


def f32_safe_epsilon(max_abs: float, base_epsilon: float = 1e-6) -> float:
    """Slack that preserves all f64-accepted pairs under f32 rounding:
    base + 2 ulps at the embedding magnitude."""
    ulp = np.spacing(np.float32(max(max_abs, 1.0)), dtype=np.float32)
    return float(base_epsilon + 2.0 * float(ulp))


def pe_mask_device(d_labels, d_degrees, d_pde,
                   q_labels, q_degrees, q_pde, epsilon: float):
    """bool[Q, P] position-wise PE match mask on device (jit-able).
    Inputs: d_* int32/f32[P, L]/[P, LD]; q_* [Q, L]/[Q, LD]."""
    import jax.numpy as jnp
    label_ok = (q_labels[:, None, :] == d_labels[None]).all(-1)
    degree_ok = (q_degrees[:, None, :] <= d_degrees[None]).all(-1)
    pde_ok = (q_pde[:, None, :] <= d_pde[None] + epsilon).all(-1)
    return label_ok & degree_ok & pde_ok


@functools.lru_cache(maxsize=8)
def _jit_pe_mask():
    import jax
    return jax.jit(pe_mask_device, static_argnames=("epsilon",))


def pe_candidates_device(data_pde, q_pde, plan_rows: np.ndarray,
                         num_query_vertices: int,
                         base_epsilon: float = 1e-6) -> List[np.ndarray]:
    """TPU candidate generation: device mask, host extraction.
    Returns a superset-exact candidate list per query vertex."""
    import jax.numpy as jnp
    eps = f32_safe_epsilon(float(np.abs(data_pde.pde).max(initial=1.0)),
                           base_epsilon)
    plan_rows = np.asarray(plan_rows)
    mask = _jit_pe_mask()(
        jnp.asarray(data_pde.labels), jnp.asarray(data_pde.degrees),
        jnp.asarray(data_pde.pde, dtype=jnp.float32),
        jnp.asarray(q_pde.labels[plan_rows]),
        jnp.asarray(q_pde.degrees[plan_rows]),
        jnp.asarray(q_pde.pde[plan_rows], dtype=jnp.float32),
        epsilon=eps)
    return extract_candidates(np.asarray(mask), data_pde.vids,
                              q_pde.vids[plan_rows], num_query_vertices)


def extract_candidates(mask: np.ndarray, data_vids: np.ndarray,
                       plan_vids: np.ndarray,
                       num_query_vertices: int) -> List[np.ndarray]:
    """Host: mask bool[Q, P] → sorted unique candidates per query vertex
    (custom.h:429-433 semantics)."""
    per_vertex: List[List[np.ndarray]] = [
        [] for _ in range(num_query_vertices)]
    l = plan_vids.shape[1]
    for qi in range(mask.shape[0]):
        hit = np.nonzero(mask[qi])[0]
        if not len(hit):
            continue
        dv = data_vids[hit]
        for k in range(l):
            per_vertex[int(plan_vids[qi, k])].append(dv[:, k])
    return [np.unique(np.concatenate(s).astype(np.int64))
            if s else np.zeros(0, dtype=np.int64) for s in per_vertex]


def pe_mask_sharded(mesh, d_labels, d_degrees, d_pde,
                    q_labels, q_degrees, q_pde, epsilon: float,
                    axis: str = "graph"):
    """shard_map'd mask: data paths sharded on ``axis`` along their
    leading dim, query replicated; output mask bool[Q, P] sharded along
    its second (path) dim — the TPU form of the reference's
    per-partition parallel search (main.cpp:160-164).  Pad P to a
    multiple of the axis size before calling."""
    import jax
    from jax.sharding import PartitionSpec as P

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P(), P()),
        out_specs=P(None, axis))
    def run(dl, dd, dp, ql, qd, qp):
        return pe_mask_device(dl, dd, dp, ql, qd, qp, epsilon)

    return run(d_labels, d_degrees, d_pde, q_labels, q_degrees, q_pde)


def pge_mask_device(d_labels, d_degrees, d_group_lo, d_group_hi,
                    d_lgroup_lo, d_lgroup_hi,
                    q_labels, q_degrees, q_group_lo,
                    q_lgroup_lo, q_lgroup_hi):
    """bool[Q, V] PGE vertex filter chain on device (GNN-PGE
    custom.h:330-372; leaf path-group test is strict, no epsilon)."""
    ok = ((q_degrees[:, None] <= d_degrees[None]) &
          (q_labels[:, None] == d_labels[None]))
    overlap = ((d_lgroup_hi[None] >= q_lgroup_lo[:, None, :]) &
               (d_lgroup_lo[None] <= q_lgroup_hi[:, None, :])).all(-1)
    dom = (d_group_hi[None] >= q_group_lo[:, None, :]).all(-1)
    return ok & overlap & dom
