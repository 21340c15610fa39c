"""Hierarchical ELLPACK aggregation: scatter-free neighbor sums.

XLA's TPU scatter serializes (segment_sum ≈ 6e7 edges/s on v5e) while
its row gather streams ~5× faster.  This layout removes the scatter
entirely: neighbors are packed into fixed-width tables and the
aggregation becomes dense gathers + axis sums.

Level structure (power-law safe): each vertex's adjacency is split
into ceil(deg/K) *chunks* of ≤K neighbors.  Level 1 computes one
partial sum per chunk (gather [C, K] rows → sum axis 1).  Level 2 sums
each vertex's ≤ceil(max_deg/K) chunk rows through a second ELL table —
recursively if a tail vertex still exceeds the width.  All shapes are
static; everything jits and shards.

The layout is built once per graph (host) and reused across layers /
training steps — the analogue of the reference building its R-tree
once per partition (custom.h:235-257).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np


@dataclass
class EllLayout:
    """One gather-sum level: out[i] = Σ_k in[tbl[i,k]] * (tbl[i,k]>=0).
    Index -1 marks padding (mapped to row 0 and masked)."""
    tbl: np.ndarray        # int32[N, K]

    @property
    def num_rows(self) -> int:
        return self.tbl.shape[0]


@dataclass
class HierarchicalEll:
    levels: List[EllLayout]
    num_vertices: int
    num_slots: int          # total gather slots (padding overhead metric)

    def apply(self, x, *, dtype=None):
        """Aggregate neighbor features: returns [V, D]."""
        import jax.numpy as jnp
        h = x if dtype is None else x.astype(dtype)
        for lvl in self.levels:
            tbl = jnp.asarray(lvl.tbl)
            idx = jnp.maximum(tbl, 0)
            mask = (tbl >= 0)
            g = jnp.take(h, idx.reshape(-1), axis=0).reshape(
                *tbl.shape, h.shape[-1])
            h = jnp.where(mask[..., None], g, 0.0).sum(axis=1)
        return h


def build_ell(offsets: np.ndarray, neighbors: np.ndarray,
              width: int = 8, level2_width: int = 8) -> HierarchicalEll:
    """Build the hierarchical layout from CSR (host, O(E))."""
    num_v = len(offsets) - 1
    deg = np.diff(offsets).astype(np.int64)

    # ---- level 1: chunks of ≤width neighbors -------------------------
    chunks_per_v = np.maximum(-(-deg // width), 1)
    c_of_v_end = np.cumsum(chunks_per_v)
    c_of_v_start = c_of_v_end - chunks_per_v
    num_chunks = int(c_of_v_end[-1])

    tbl1 = np.full((num_chunks, width), -1, dtype=np.int32)
    # Chunk row r of vertex v covers neighbors [offsets[v]+ (r-start)*W ...]
    # Vectorized fill: for each slot position j, the arcs at position
    # j within their chunk.
    arc_v = np.repeat(np.arange(num_v), deg)
    arc_pos = np.arange(len(neighbors)) - np.repeat(offsets[:-1], deg)
    chunk_row = c_of_v_start[arc_v] + arc_pos // width
    slot = arc_pos % width
    tbl1[chunk_row, slot] = neighbors

    levels = [EllLayout(tbl1)]
    slots = tbl1.size

    # ---- level 2+: fold chunk rows per vertex ------------------------
    cur_counts = chunks_per_v
    cur_start = c_of_v_start
    while True:
        kmax = int(cur_counts.max()) if num_v else 1
        if kmax <= level2_width:
            tbl = np.full((num_v, level2_width), -1, dtype=np.int32)
            item_v = np.repeat(np.arange(num_v), cur_counts)
            pos = (np.arange(int(cur_counts.sum()))
                   - np.repeat(cur_start, cur_counts))
            tbl[item_v, pos] = np.arange(int(cur_counts.sum()))
            levels.append(EllLayout(tbl))
            slots += tbl.size
            break
        # Another chunking level over the chunk rows.
        n_items = int(cur_counts.sum())
        sub = np.maximum(-(-cur_counts // level2_width), 1)
        sub_end = np.cumsum(sub)
        sub_start = sub_end - sub
        n_sub = int(sub_end[-1])
        tbl = np.full((n_sub, level2_width), -1, dtype=np.int32)
        item_v = np.repeat(np.arange(num_v), cur_counts)
        pos = np.arange(n_items) - np.repeat(cur_start, cur_counts)
        row = sub_start[item_v] + pos // level2_width
        tbl[row, pos % level2_width] = np.arange(n_items)
        levels.append(EllLayout(tbl))
        slots += tbl.size
        cur_counts = sub
        cur_start = sub_start

    return HierarchicalEll(levels=levels, num_vertices=num_v,
                           num_slots=int(slots))


def ell_neighbor_sum(layout: HierarchicalEll, x):
    return layout.apply(x)
