"""Distributed online candidate search over a device mesh.

The reference parallelizes the online search with one OpenMP thread per
METIS partition, each filling a private candidate set, merged serially
afterwards (GNN-PE/src/main.cpp:155-172, GNN-PGE/src/main.cpp:342-346).
The TPU-native form shards the *entry table* (paths for PE, vertices
for PGE) across the mesh's "graph" axis and runs the dominance filter
as one shard_map'd masked compare; the union is either

  * ``union="host"``  — the bool[Q, P] pair mask concatenates across
    shards (out_specs P(None, axis)) and the host extracts candidates,
    optionally re-verifying every accepted pair in f64 so the candidate
    sets are bit-identical to the exact host filter (strict PE-parity
    mode needs this: PE's answer count depends on the candidate set,
    SURVEY.md §0.3); or
  * ``union="device"` — each device scatters its hits into a
    bool[Qv, V] vertex bitmap and the bitmaps OR-combine with a psum
    over ICI — the collective form of the reference's serial set union.
    O(Qv·V) output regardless of path count; the right choice at scale
    (P ~ 10^8 makes the pair mask itself the bottleneck).

Both run the compare in f32 with an inflated epsilon (a guaranteed
superset of the f64 decision — see match.device_filter); "host" mode
then trims the superset back to exact.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np

from gnnpe_tpu.match.device_filter import (extract_candidates,
                                           f32_safe_epsilon,
                                           pe_mask_device)


def pad_rows(arr: np.ndarray, n_shards: int, fill) -> np.ndarray:
    """Pad the leading dim to a multiple of n_shards (fill rows never
    match: label fill -1, degree fill high, pde fill +inf as needed)."""
    p = len(arr)
    per = -(-max(p, 1) // n_shards)
    pad = per * n_shards - p
    if pad == 0:
        return arr
    return np.concatenate(
        [arr, np.full((pad,) + arr.shape[1:], fill, arr.dtype)])


class ShardedPESearch:
    """PE candidate search with the path table sharded over one mesh
    axis.  Device arrays are placed once at construction; each online
    query is a single jit'd shard_map dispatch."""

    def __init__(self, mesh, data_pde, axis: str = "graph",
                 base_epsilon: float = 1e-6):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.mesh = mesh
        self.axis = axis
        self.num_paths = data_pde.num_paths
        self.base_epsilon = base_epsilon
        self.epsilon = f32_safe_epsilon(
            float(np.abs(data_pde.pde).max(initial=1.0)), base_epsilon)
        n = mesh.shape[axis]
        # Padding rows: label -1 fails the equality test on every
        # real query label, so they can never produce a candidate.
        labels = pad_rows(data_pde.labels, n, -1)
        degrees = pad_rows(data_pde.degrees, n, 0)
        pde = pad_rows(data_pde.pde.astype(np.float32), n, np.float32("inf"))
        vids = pad_rows(data_pde.vids, n, 0)
        shard = NamedSharding(mesh, P(axis))
        self.d_labels = jax.device_put(jnp.asarray(labels), shard)
        self.d_degrees = jax.device_put(jnp.asarray(degrees), shard)
        self.d_pde = jax.device_put(jnp.asarray(pde), shard)
        self.d_vids = jax.device_put(jnp.asarray(vids), shard)
        # Host copies for the f64 re-verification pass.
        self._host = data_pde
        self._mask_fn = None
        self._bitmap_fn = {}

    # -- union="host": pair mask + exact f64 trim ----------------------
    def _build_mask_fn(self):
        import jax
        from jax.sharding import PartitionSpec as P
        eps = self.epsilon

        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P(self.axis), P(self.axis), P(self.axis),
                      P(), P(), P()),
            out_specs=P(None, self.axis))
        def run(dl, dd, dp, ql, qd, qp):
            return pe_mask_device(dl, dd, dp, ql, qd, qp, eps)

        return jax.jit(run)

    def search(self, query_pde, plan_rows: np.ndarray,
               num_query_vertices: int, union: str = "host",
               exact_f64: bool = True) -> List[np.ndarray]:
        import jax.numpy as jnp
        rows = np.asarray(plan_rows)
        # Bucket the query-row count to the next power of two so the
        # jit compiles once per bucket, not once per distinct query
        # shape (compiles cost seconds through a remote backend).
        q = len(rows)
        qb = 1 << max(0, (q - 1).bit_length())
        pad = qb - q
        ql_np = np.concatenate(
            [query_pde.labels[rows],
             np.full((pad,) + query_pde.labels.shape[1:], -1,
                     query_pde.labels.dtype)]) if pad else \
            query_pde.labels[rows]
        qd_np = np.concatenate(
            [query_pde.degrees[rows],
             np.zeros((pad,) + query_pde.degrees.shape[1:],
                      query_pde.degrees.dtype)]) if pad else \
            query_pde.degrees[rows]
        qp_np = np.concatenate(
            [query_pde.pde[rows],
             np.zeros((pad,) + query_pde.pde.shape[1:],
                      query_pde.pde.dtype)]) if pad else \
            query_pde.pde[rows]
        ql = jnp.asarray(ql_np)
        qd = jnp.asarray(qd_np)
        qp = jnp.asarray(qp_np.astype(np.float32))
        if union == "device":
            vpad = np.concatenate(
                [query_pde.vids[rows],
                 np.zeros((pad,) + query_pde.vids.shape[1:],
                          query_pde.vids.dtype)]) if pad else \
                query_pde.vids[rows]
            return self._search_device_union(
                ql, qd, qp, vpad, num_query_vertices, real_q=q)
        if self._mask_fn is None:
            self._mask_fn = self._build_mask_fn()
        mask = np.asarray(self._mask_fn(
            self.d_labels, self.d_degrees, self.d_pde, ql, qd, qp))
        mask = mask[:q, :self.num_paths]
        if exact_f64:
            mask = self._trim_to_f64(mask, query_pde, rows)
        return extract_candidates(mask, self._host.vids,
                                  query_pde.vids[rows],
                                  num_query_vertices)

    def _trim_to_f64(self, mask: np.ndarray, query_pde,
                     rows: np.ndarray) -> np.ndarray:
        """Re-verify accepted pairs with the exact f64 compare (the
        reference's epsilon semantics, custom.h:410-434) — the f32 pass
        is a superset, so only accepted pairs need rechecking."""
        eps = self.base_epsilon
        out = np.zeros_like(mask)
        for qi in range(mask.shape[0]):
            hit = np.nonzero(mask[qi])[0]
            if not len(hit):
                continue
            q = query_pde.pde[rows[qi]]
            ok = (self._host.pde[hit] >= q - eps).all(axis=1)
            out[qi, hit[ok]] = True
        return out

    # -- union="device": per-shard vertex bitmap + psum-OR -------------
    def _build_bitmap_fn(self, num_vertices: int, l: int, nq: int):
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        eps = self.epsilon
        axis = self.axis

        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis),
                      P(), P(), P(), P()),
            out_specs=P())
        def run(dl, dd, dp, dv, ql, qd, qp, qv):
            # mask[qi, p] over the local path shard
            m = pe_mask_device(dl, dd, dp, ql, qd, qp, eps)
            # fold hits straight onto (query-vertex, data-vertex):
            # out[qv[qi, k], dv[p, k]] |= m[qi, p]
            out = jnp.zeros((nq, num_vertices), dtype=jnp.int32)
            for k in range(l):       # l is tiny (path_length+1, ~3)
                out = out.at[qv[:, k][:, None], dv[None, :, k]].max(
                    m.astype(jnp.int32))
            return jax.lax.psum(out, axis)  # psum-as-OR: values ∈ {0,1}·n

        return jax.jit(run)

    def _search_device_union(self, ql, qd, qp, q_vids,
                             num_query_vertices: int,
                             real_q: Optional[int] = None
                             ) -> List[np.ndarray]:
        # Padded query rows (label -1) match nothing, so they scatter
        # nothing; real_q is only for documentation.
        import jax.numpy as jnp
        l = q_vids.shape[1]
        key = (l, num_query_vertices)
        if key not in self._bitmap_fn:
            nv = int(self._host.vids.max(initial=0)) + 1
            self._bitmap_fn[key] = self._build_bitmap_fn(
                nv, l, num_query_vertices)
        out = np.asarray(self._bitmap_fn[key](
            self.d_labels, self.d_degrees, self.d_pde, self.d_vids,
            ql, qd, qp, jnp.asarray(q_vids)))
        return [np.nonzero(out[i])[0].astype(np.int64)
                for i in range(num_query_vertices)]


class ShardedPGESearch:
    """PGE candidate search with the vertex table sharded over one mesh
    axis.  The filter output *is* the per-query-vertex candidate mask
    (one entry per data vertex), so the shard outputs concatenate
    directly — no scatter needed."""

    def __init__(self, mesh, labels, degrees, group, label_group,
                 axis: str = "graph", base_epsilon: float = 1e-6):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.mesh = mesh
        self.axis = axis
        self.num_vertices = len(labels)
        hi = float(max(np.abs(group).max(initial=1.0),
                       np.abs(label_group).max(initial=1.0)))
        self.epsilon = f32_safe_epsilon(hi, 0.0)
        self._h_labels = labels
        self._h_degrees = degrees
        self._h_group = group
        self._h_label_group = label_group
        n = mesh.shape[axis]
        shard = NamedSharding(mesh, P(axis))
        f32 = np.float32
        self.d_labels = jax.device_put(
            jnp.asarray(pad_rows(labels, n, -1)), shard)
        self.d_degrees = jax.device_put(
            jnp.asarray(pad_rows(degrees, n, 0)), shard)
        self.d_glo = jax.device_put(jnp.asarray(
            pad_rows(group[:, 0, :].astype(f32), n, f32("inf"))), shard)
        self.d_ghi = jax.device_put(jnp.asarray(
            pad_rows(group[:, 1, :].astype(f32), n, -f32("inf"))), shard)
        self.d_llo = jax.device_put(jnp.asarray(
            pad_rows(label_group[:, 0, :].astype(f32), n, f32("inf"))),
            shard)
        self.d_lhi = jax.device_put(jnp.asarray(
            pad_rows(label_group[:, 1, :].astype(f32), n, -f32("inf"))),
            shard)
        self._mask_fn = None

    def _build_mask_fn(self):
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        eps = self.epsilon

        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P(self.axis),) * 6 + (P(),) * 5,
            out_specs=P(None, self.axis))
        def run(dl, dd, dglo, dghi, dllo, dlhi, ql, qd, qglo, qllo, qlhi):
            ok = ((qd[:, None] <= dd[None]) & (ql[:, None] == dl[None]))
            overlap = ((dlhi[None] >= qllo[:, None, :] - eps) &
                       (dllo[None] <= qlhi[:, None, :] + eps)).all(-1)
            dom = (dghi[None] >= qglo[:, None, :] - eps).all(-1)
            return ok & overlap & dom

        return jax.jit(run)

    def search(self, q_labels, q_degrees, q_group, q_label_group,
               q_vertex_ids, exact_f64: bool = True) -> List[np.ndarray]:
        import jax.numpy as jnp
        if self._mask_fn is None:
            self._mask_fn = self._build_mask_fn()
        f32 = np.float32
        # Power-of-two query bucketing (one compile per bucket).
        q = len(q_labels)
        qb = 1 << max(0, (q - 1).bit_length())
        pad = qb - q
        if pad:
            q_labels = np.concatenate(
                [q_labels, np.full(pad, -1, q_labels.dtype)])
            q_degrees = np.concatenate(
                [q_degrees, np.zeros(pad, q_degrees.dtype)])
            q_group = np.concatenate(
                [q_group, np.zeros((pad,) + q_group.shape[1:],
                                   q_group.dtype)])
            q_label_group = np.concatenate(
                [q_label_group,
                 np.zeros((pad,) + q_label_group.shape[1:],
                          q_label_group.dtype)])
        mask = np.asarray(self._mask_fn(
            self.d_labels, self.d_degrees, self.d_glo, self.d_ghi,
            self.d_llo, self.d_lhi,
            jnp.asarray(q_labels), jnp.asarray(q_degrees),
            jnp.asarray(q_group[:, 0, :].astype(f32)),
            jnp.asarray(q_label_group[:, 0, :].astype(f32)),
            jnp.asarray(q_label_group[:, 1, :].astype(f32))))
        mask = mask[:q, :self.num_vertices]
        out: List[np.ndarray] = []
        for j, _ in enumerate(q_vertex_ids):
            hit = np.nonzero(mask[j])[0]
            if exact_f64 and len(hit):
                # Strict f64 recheck (GNN-PGE custom.h:330-372 has no
                # epsilon; the f32 pass was a superset).
                ok = (((self._h_label_group[hit, 1, :] >=
                        q_label_group[j, 0, :]) &
                       (self._h_label_group[hit, 0, :] <=
                        q_label_group[j, 1, :])).all(-1) &
                      (self._h_group[hit, 1, :] >=
                       q_group[j, 0, :]).all(-1))
                hit = hit[ok]
            out.append(hit.astype(np.int64))
        return out
