"""Blocked, double-buffered Pallas row-gather SpMM (VERDICT r2 item 3).

The round-2 roofline defense rested on XLA's gather engine being the
fastest way to fetch random rows (490-520 M rows/s at D=128 on v5e).
The one untried alternative family was a blocked Pallas kernel that
DMAs rows HBM→VMEM itself with deep double buffering.  This is that
kernel, written to give DMA its best shot:

  * grid over tiles of TILE_R table rows (w slots each);
  * the index table is SCALAR-PREFETCHED into SMEM so every DMA source
    offset is known before the tile body runs;
  * per tile, TILE_R·w single-row async copies are issued back-to-back
    into one of two VMEM buffers (tile t+1's copies are issued before
    tile t's compute — classic double buffering, hundreds of copies in
    flight);
  * compute is a [TILE_R, w, D] sum over w plus a pad correction —
    negligible next to the fetch.

The measured result (bench harness, same graph/layout as bench.py) is
recorded in BASELINE.md.  Per-row DMA costs a descriptor each (~30 ns
class) — the per-arc kernel hit 33 M rows/s; this blocked version
pipelines the descriptors but cannot merge them, because binned rows
gather ARBITRARY vertex rows with no contiguity to exploit.  Whatever
the number says, it settles whether "beat the gather engine with
blocked DMA" is real or not on this hardware.

Run: python experiments/pallas_blocked_spmm.py [--interpret]
"""

from __future__ import annotations

import functools

import numpy as np


def blocked_gather_sum(x, tbl, padcnt=None, tile_r: int = 128,
                       interpret: bool = False):
    """out[i] = Σ_k x[tbl[i, k]] − padcnt[i]·x[0]; tbl int32[N, W]
    (pads point at row 0), x f32[V, D].  N must divide by tile_r."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, w = tbl.shape
    v, d = x.shape
    assert n % tile_r == 0, (n, tile_r)
    num_tiles = n // tile_r
    rows_per_tile = tile_r * w

    def kernel(idx_sm, x_hbm, out_ref, scratch, sem):
        t = pl.program_id(0)

        def issue(tile, slot):
            base = tile * rows_per_tile

            def body(k, _):
                pltpu.make_async_copy(
                    x_hbm.at[idx_sm[base + k]],
                    scratch.at[slot, k],
                    sem.at[slot],
                ).start()
                return 0

            jax.lax.fori_loop(0, rows_per_tile, body, 0)

        def drain(tile, slot):
            base = tile * rows_per_tile

            def body(k, _):
                pltpu.make_async_copy(
                    x_hbm.at[idx_sm[base + k]],
                    scratch.at[slot, k],
                    sem.at[slot],
                ).wait()
                return 0

            jax.lax.fori_loop(0, rows_per_tile, body, 0)

        slot = jax.lax.rem(t, 2)
        # Warm-up: tile 0 issues its own copies; afterwards tile t's
        # copies were issued by tile t-1, and tile t issues t+1's.
        @pl.when(t == 0)
        def _():
            issue(0, 0)

        @pl.when(t + 1 < num_tiles)
        def _():
            issue(t + 1, jax.lax.rem(t + 1, 2))

        drain(t, slot)
        out_ref[...] = scratch[slot].reshape(tile_r, w, d).sum(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tile_r, d), lambda t, idx: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rows_per_tile, d), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, d), x.dtype),
        interpret=interpret,
    )(jnp.asarray(tbl.reshape(-1)), x)
    if padcnt is not None:
        out = out - jnp.asarray(padcnt)[:, None] * x[0]
    return out


def _bench(interpret: bool = False):
    import jax
    import jax.numpy as jnp
    import sys
    import time

    sys.path.insert(0, ".")
    from bench import _step_time, synth_graph
    from gnnpe_tpu.ops.ell import build_binned_ell
    from gnnpe_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    num_vertices, num_edges, dim = 100_000, 800_000, 128
    src, dst = synth_graph(num_vertices, num_edges)
    counts = np.bincount(dst, minlength=num_vertices)
    offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    layout = build_binned_ell(offs, src, hub_matmul=False)
    # One uniform table: the widest class with the most rows gives DMA
    # its best regime (longest uninterrupted descriptor stream).
    tbl = max(layout.class_tables, key=lambda t: t.size)
    # SMEM holds the scalar-prefetched index table (~1 MB budget):
    # cap the stream; the per-row RATE is the quantity under test.
    w = tbl.shape[1]
    n = min((tbl.shape[0] // 128) * 128, (120_000 // w // 128) * 128)
    tbl = np.ascontiguousarray(tbl[:n])
    x = jnp.asarray(np.random.RandomState(1).rand(
        num_vertices, dim).astype(np.float32))

    # Correctness first (tiny slice, interpret-friendly).
    small = tbl[:256]
    got = np.asarray(blocked_gather_sum(x, small, interpret=interpret))
    want = np.asarray(x)[small.reshape(-1)].reshape(256, w, dim).sum(1)
    assert np.allclose(got, want, rtol=1e-5, atol=1e-5), \
        np.abs(got - want).max()
    print(f"correctness OK on [{small.shape}] tile")
    if interpret:
        return

    # Throughput: kernel vs XLA's flat gather over the same slots.
    rows_total = tbl.size
    kfn = lambda h: blocked_gather_sum(h, tbl)[:1] * 1e-9 + h
    t_kernel = _step_time(kfn, x)
    gidx = jnp.asarray(tbl.reshape(-1))
    gfn = lambda h: jnp.take(h, gidx, axis=0).sum(0, keepdims=True) \
        * 1e-9 + h
    t_gather = _step_time(gfn, x)
    print(f"blocked-DMA kernel: {rows_total} rows in "
          f"{t_kernel*1e3:.2f} ms = {rows_total/t_kernel/1e6:.0f} M rows/s")
    print(f"XLA flat gather:    {rows_total} rows in "
          f"{t_gather*1e3:.2f} ms = {rows_total/t_gather/1e6:.0f} M rows/s")
    print(f"kernel/gather = {t_gather/t_kernel:.2f}x "
          f"({'KERNEL WINS' if t_kernel < t_gather else 'gather engine wins'})")


if __name__ == "__main__":
    import sys
    _bench(interpret="--interpret" in sys.argv)
