"""Vertex-partitioned aggregation with halo (boundary) exchange.

parallel/dist.py's edge-parallel form psums a FULL [V, D] buffer every
hop — exact and simple, but its collective volume is O(V·D) per device
regardless of the cut.  This module implements the scalable layout
from SURVEY.md §2.3/§5: vertices are partitioned across the mesh, each
device owns its feature rows, and one ``all_to_all`` moves only the
boundary rows the neighbors actually need (O(cut·D)); aggregation then
runs entirely on local arc lists.  With a decent partitioner the cut
is a small fraction of V and the exchange rides ICI.

Layout (host-built once per graph+mesh, ``HaloPlan.build``):
  * vertices are assigned to ``n`` contiguous ranges after permutation
    by the partition membership (so "owned rows" are a slice);
  * ``send_idx[s, t, H]`` — local row ids shard s must ship to shard t
    (padded to the max pair count; -1 = pad row, zeros sent);
  * per-device arc lists (local-dst sorted) whose src ids index the
    device's EXTENDED buffer: [own rows | halo rows from shard 0 | …].

The device step (``aggregate``) is shard_map'd: gather send rows →
all_to_all → concat with owned rows → masked segment-sum over local
arcs.  Exactness: equals the dense aggregation row-for-row.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import numpy as np


@dataclass
class HaloPlan:
    num_shards: int
    perm: np.ndarray          # int64[V] new→old vertex order (owned runs)
    rank: np.ndarray          # int64[V] old→new
    bounds: np.ndarray        # int64[n+1] owned ranges in permuted space
    own_pad: int              # padded owned-rows per shard
    halo_pad: int             # padded per-pair halo count
    arc_pad: int              # padded per-shard arc count
    send_idx: np.ndarray      # int32[n, n, halo_pad] local row ids (-1 pad)
    arc_src: np.ndarray       # int32[n, arc_pad] ext-buffer row ids (-1 pad)
    arc_dst: np.ndarray       # int32[n, arc_pad] local dst row ids

    @classmethod
    def build(cls, offsets: np.ndarray, neighbors: np.ndarray,
              membership: np.ndarray, num_shards: int) -> "HaloPlan":
        v = len(offsets) - 1
        membership = np.asarray(membership)
        # Contiguous ownership: permute vertices by (shard, id).
        perm = np.lexsort((np.arange(v), membership))
        rank = np.empty(v, dtype=np.int64)
        rank[perm] = np.arange(v)
        counts = np.bincount(membership, minlength=num_shards)
        bounds = np.concatenate([[0], np.cumsum(counts)])
        own_pad = int(counts.max()) if v else 1

        deg = np.diff(offsets)
        dst_old = np.repeat(np.arange(v), deg)
        src_old = neighbors
        s_dst = membership[dst_old]          # owning shard of each arc
        s_src = membership[src_old]

        # Halo sets: for each (owner s of src, consumer t of dst) with
        # s != t, the distinct src vertices shipped s → t.
        send_lists = [[np.zeros(0, np.int64)] * num_shards
                      for _ in range(num_shards)]
        for s in range(num_shards):
            mask_s = s_src == s
            for t in range(num_shards):
                if s == t:
                    continue
                m = mask_s & (s_dst == t)
                send_lists[s][t] = np.unique(src_old[m])
        halo_pad = max(1, max((len(send_lists[s][t])
                               for s in range(num_shards)
                               for t in range(num_shards)), default=1))
        send_idx = np.full((num_shards, num_shards, halo_pad), -1,
                           dtype=np.int32)
        for s in range(num_shards):
            for t in range(num_shards):
                ids = send_lists[s][t]
                # local row of vertex u on its owner = rank[u]-bounds[s]
                send_idx[s, t, :len(ids)] = rank[ids] - bounds[s]

        # Extended-buffer layout on shard t:
        #   [0, own_pad)                       owned rows
        #   [own_pad + s*halo_pad + k)         halo row k from shard s
        ext_row = {}
        for t in range(num_shards):
            for s in range(num_shards):
                for k, u in enumerate(send_lists[s][t]):
                    ext_row[(t, int(u))] = own_pad + s * halo_pad + k

        arc_pad = max(1, int(np.bincount(s_dst,
                                         minlength=num_shards).max()))
        arc_src = np.full((num_shards, arc_pad), -1, dtype=np.int32)
        arc_dst = np.zeros((num_shards, arc_pad), dtype=np.int32)
        for t in range(num_shards):
            m = s_dst == t
            srcs, dsts = src_old[m], dst_old[m]
            rows = np.empty(len(srcs), dtype=np.int32)
            local_src = membership[srcs] == t
            rows[local_src] = (rank[srcs[local_src]]
                               - bounds[t]).astype(np.int32)
            for i in np.nonzero(~local_src)[0]:
                rows[i] = ext_row[(t, int(srcs[i]))]
            arc_src[t, :len(rows)] = rows
            arc_dst[t, :len(rows)] = (rank[dsts] - bounds[t]).astype(
                np.int32)
        return cls(num_shards=num_shards, perm=perm, rank=rank,
                   bounds=bounds, own_pad=own_pad, halo_pad=halo_pad,
                   arc_pad=arc_pad, send_idx=send_idx,
                   arc_src=arc_src, arc_dst=arc_dst)

    # ------------------------------------------------------------------
    def shard_features(self, x: np.ndarray) -> np.ndarray:
        """Host: [V, D] → [n, own_pad, D] owned rows per shard."""
        n, d = self.num_shards, x.shape[1]
        out = np.zeros((n, self.own_pad, d), dtype=x.dtype)
        for s in range(n):
            lo, hi = self.bounds[s], self.bounds[s + 1]
            out[s, :hi - lo] = x[self.perm[lo:hi]]
        return out

    def unshard_features(self, shards: np.ndarray) -> np.ndarray:
        """Host: [n, own_pad, D] → [V, D] in original vertex order."""
        v = len(self.perm)
        parts = [shards[s, :self.bounds[s + 1] - self.bounds[s]]
                 for s in range(self.num_shards)]
        stacked = np.concatenate(parts, axis=0)
        return stacked[self.rank]

    def make_aggregate(self, mesh, axis: str = "graph"):
        """Device step: [n, own_pad, D] sharded on ``axis`` → same.
        out[own row r of shard t] = Σ_{arcs into r} x[src]."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        send = jnp.asarray(self.send_idx)       # [n, n, H]
        asrc = jnp.asarray(self.arc_src)        # [n, A]
        adst = jnp.asarray(self.arc_dst)        # [n, A]
        own_pad = self.own_pad

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=P(axis))
        def agg(x_own, send_s, asrc_s, adst_s):
            x_own = x_own[0]                    # [own_pad, D]
            sidx = send_s[0]                    # [n, H]
            out_rows = jnp.where(
                (sidx >= 0)[..., None],
                jnp.take(x_own, jnp.maximum(sidx, 0), axis=0), 0.0)
            # all_to_all: slot t of my sends → my slot from each peer.
            halo = jax.lax.all_to_all(out_rows, axis, split_axis=0,
                                      concat_axis=0, tiled=True)
            ext = jnp.concatenate(
                [x_own, halo.reshape(-1, x_own.shape[-1])], axis=0)
            src_rows = asrc_s[0]
            gathered = jnp.where(
                (src_rows >= 0)[:, None],
                jnp.take(ext, jnp.maximum(src_rows, 0), axis=0), 0.0)
            local = jax.ops.segment_sum(gathered, adst_s[0],
                                        num_segments=own_pad)
            return local[None]

        def run(x_shards):
            return agg(x_shards, send, asrc, adst)
        return run
