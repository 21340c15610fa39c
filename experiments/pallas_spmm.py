"""RETIRED EXPERIMENT — Pallas per-row-DMA SpMM (kept for the record).

Measured on v5e (round 1, D=128, 800k-arc power-law): **33 M edges/s**
— 11x slower than the production binned-ELL layout (368 M, round 2)
and 2x slower than XLA's segment_sum.  Root cause: each single-row
gather costs one DMA descriptor (~30 ns overhead) while the XLA gather
engine retires a row every ~1.9 ns; no amount of descriptor pipelining
closes a 15x per-row gap.  The block-DMA alternative (gather K rows per
descriptor via a packed D=256 layout) was measured in round 2 and is
WORSE: XLA row gather at D=256 regresses to 130 M rows/s (vs 518 M at
D=128), so wider rows lose before the kernel even starts.  Conclusion:
on TPU the hardware gather engine is the only path to the row-rate
bound; the right design is the scatter-free layout around it
(gnnpe_tpu/ops/ell.py), not a hand-rolled gather.

Original design notes below.  The kernel remains correct
(tests/test_ops.py::test_pallas_spmm_interpret runs it in interpret
mode) so the measurement stays reproducible.

Pallas TPU SpMM: CSR neighbor aggregation ``out[v] = Σ_{u∈N(v)} x[u]``.

Why a kernel was tried: XLA's scatter (segment_sum) serializes on TPU —
measured ~6e7 edges/s on v5e vs ~5e8 rows/s for the gather alone.  This
kernel streams dst-sorted arcs, issues deeply pipelined single-row DMAs
from HBM for the x[src] gathers (the only irregular access), and
accumulates each output row tile in VMEM, so the scatter costs nothing.

Mosaic layout constraints shape the design:
  * 1D int32 HBM refs slice at 1024-element tiling → arc indices are
    walked in 1024-aligned chunks (tile arc ranges are not aligned, so
    each chunk processes its intersection with [lo, hi));
  * 2D f32 HBM refs tile at (8, 128) → x is viewed as (V, 1, D) so a
    single-row gather slices the *untiled* leading dim.

Host-side prep (``csr_tiles``): arcs sorted by destination, tile_ptr
int32[T+1] marking each output tile's arc range, arrays padded past E
by one chunk (dynamic_slice clamps OOB starts, which would silently
shift reads).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_ROWS = 256          # output rows per grid step
N_INFLIGHT = 16          # rotating DMA slots for the row gather
CHUNK = 1024             # int32 HBM tiling granule


def csr_tiles(offsets: np.ndarray, neighbors: np.ndarray,
              tile_rows: int = TILE_ROWS
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side prep: (src int32[E_pad], dst_local int32[E_pad],
    tile_ptr int32[T+1]); arcs sorted by dst (CSR order).  E padded to
    a CHUNK multiple plus one spare chunk."""
    num_v = len(offsets) - 1
    deg = np.diff(offsets)
    dst = np.repeat(np.arange(num_v, dtype=np.int32), deg)
    src = neighbors.astype(np.int32)
    num_tiles = -(-num_v // tile_rows) if num_v else 0
    tile_ptr = offsets[np.minimum(
        np.arange(num_tiles + 1) * tile_rows, num_v)].astype(np.int32)
    dst_local = (dst - (dst // tile_rows) * tile_rows).astype(np.int32)
    e = len(src)
    pad = (-(-e // CHUNK) + 1) * CHUNK - e
    src = np.concatenate([src, np.zeros(pad, np.int32)])
    dst_local = np.concatenate([dst_local, np.zeros(pad, np.int32)])
    return src, dst_local, tile_ptr


def _spmm_kernel(tile_ptr_ref,          # scalar prefetch: int32[T+1]
                 src_ref,               # HBM: int32[E_pad]
                 dst_local_ref,         # HBM: int32[E_pad]
                 x_ref,                 # HBM: f32[V, 1, D]
                 out_ref,               # VMEM tile: f32[TILE_ROWS, D]
                 acc_ref,               # scratch f32[TILE_ROWS, D]
                 row_buf,               # scratch f32[N_INFLIGHT, 1, D]
                 src_idx,               # scratch SMEM int32[CHUNK]
                 dst_idx,               # scratch SMEM int32[CHUNK]
                 sems,                  # DMA sems (N_INFLIGHT,)
                 idx_sems):             # DMA sems (2,)
    t = pl.program_id(0)
    lo = tile_ptr_ref[t]
    hi = tile_ptr_ref[t + 1]

    acc_ref[:] = jnp.zeros_like(acc_ref)

    c0 = lo // CHUNK
    c1 = lax_cdiv(hi, CHUNK)

    def chunk_body(c, _):
        base = c * CHUNK
        k_start = jnp.maximum(lo - base, 0)
        k_end = jnp.minimum(hi - base, CHUNK)
        # Fetch this chunk's src/dst indices into SMEM (aligned slices).
        d1 = pltpu.make_async_copy(
            src_ref.at[pl.ds(base, CHUNK)], src_idx, idx_sems.at[0])
        d2 = pltpu.make_async_copy(
            dst_local_ref.at[pl.ds(base, CHUNK)], dst_idx,
            idx_sems.at[1])
        d1.start()
        d2.start()
        d1.wait()
        d2.wait()

        def row_dma(slot, k):
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(src_idx[k], 1)],
                row_buf.at[pl.ds(slot, 1)], sems.at[slot])

        def warm(k, _):
            row_dma(k % N_INFLIGHT, k).start()
            return 0

        jax.lax.fori_loop(k_start,
                          jnp.minimum(k_start + N_INFLIGHT, k_end),
                          warm, 0)

        def arc_body(k, _):
            slot = k % N_INFLIGHT
            row_dma(slot, k).wait()
            d = dst_idx[k]
            acc_ref[pl.ds(d, 1), :] += row_buf[slot]
            nxt = k + N_INFLIGHT

            @pl.when(nxt < k_end)
            def _():
                row_dma(nxt % N_INFLIGHT, nxt).start()
            return 0

        jax.lax.fori_loop(k_start, k_end, arc_body, 0)
        return 0

    jax.lax.fori_loop(c0, c1, chunk_body, 0)
    out_ref[:] = acc_ref[:]


def lax_cdiv(a, b):
    return (a + b - 1) // b


@functools.partial(jax.jit, static_argnames=("num_vertices", "tile_rows",
                                             "interpret"))
def spmm_pallas_prepared(src, dst_local, tile_ptr, x, *,
                         num_vertices: int, tile_rows: int = TILE_ROWS,
                         interpret: bool = False):
    """Run the kernel on pre-tiled arcs.  Returns f32[num_v_pad, D]
    (padded to a tile multiple; caller slices)."""
    d = x.shape[-1]
    x3 = x.reshape(-1, 1, d)
    num_tiles = len(tile_ptr) - 1
    out_rows = num_tiles * tile_rows

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # src
            pl.BlockSpec(memory_space=pltpu.ANY),   # dst_local
            pl.BlockSpec(memory_space=pltpu.ANY),   # x (V, 1, D)
        ],
        out_specs=pl.BlockSpec((tile_rows, d), lambda t, ptr: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile_rows, d), jnp.float32),
            pltpu.VMEM((N_INFLIGHT, 1, d), jnp.float32),
            pltpu.SMEM((CHUNK,), jnp.int32),
            pltpu.SMEM((CHUNK,), jnp.int32),
            pltpu.SemaphoreType.DMA((N_INFLIGHT,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _spmm_kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, d), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(tile_ptr, src, dst_local, x3)


def spmm_pallas(offsets, neighbors, x, *, interpret: bool = False):
    """CSR aggregation via the Pallas kernel.  Host-preps tiles (cache
    them with csr_tiles for repeated use)."""
    offsets_np = np.asarray(offsets)
    neighbors_np = np.asarray(neighbors)
    num_v = len(offsets_np) - 1
    src, dst_local, tile_ptr = csr_tiles(offsets_np, neighbors_np)
    out = spmm_pallas_prepared(
        jnp.asarray(src), jnp.asarray(dst_local), jnp.asarray(tile_ptr),
        x, num_vertices=num_v, interpret=interpret)
    return out[:num_v]
