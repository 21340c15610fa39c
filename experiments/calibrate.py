"""v5e aggregation calibration harness (round 2).

Measures, with the long/short-loop differencing methodology from
bench.py (loop inside one jit, data-dependency chained, scalar
readback), the access-pattern rates that bound the SpMM:

  stream      : dense read+write ceiling
  gather{D}   : raw row-gather rate at feature dim D (f32/bf16)
  segsum      : XLA scatter (segment_sum) reference point
  binned      : production BinnedEll apply_perm (hub on / off)
  flat        : single flat gather over all slots + per-class sums

Run:  python experiments/calibrate.py [--edges 800000] [--verts 100000]
Prints one line per measurement; paste the table into BASELINE.md.
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import synth_graph  # noqa: E402


def timed(make, x, short=2, long=12, reps=2):
    import jax

    def readback(f):
        float(f(x))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(x))
            best = min(best, time.perf_counter() - t0)
        return best

    t_s = readback(make(short))
    t_l = readback(make(long))
    return max((t_l - t_s) / (long - short), 1e-9)


def loop(agg, iters):
    import jax

    def body(i, x):
        return x + agg(x) * 1e-9

    return jax.jit(lambda x: jax.lax.fori_loop(0, iters, body, x).sum())


def main():
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--verts", type=int, default=100_000)
    ap.add_argument("--edges", type=int, default=800_000)
    ap.add_argument("--dim", type=int, default=128)
    args = ap.parse_args()
    V, E, D = args.verts, args.edges, args.dim

    print(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(V, D).astype(np.float32))

    # ---- dense stream --------------------------------------------------
    dt = timed(lambda it: loop(lambda h: h + 1.0, it), x)
    gbs = 2 * V * D * 4 / dt / 1e9
    print(f"stream       : {dt*1e3:7.3f} ms  {gbs:7.1f} GB/s")

    # ---- raw gathers ---------------------------------------------------
    src, dst = synth_graph(V, E)
    nslots = int(E * 1.37)  # match binned slot count
    gidx = jnp.asarray(rng.randint(0, V, size=nslots).astype(np.int32))
    for d_, dt_ in ((D, jnp.float32), (2 * D, jnp.float32),
                    (D, jnp.bfloat16)):
        xx = jnp.asarray(rng.rand(V, d_)).astype(dt_)
        agg = lambda h: jnp.take(h, gidx, axis=0).sum(0, keepdims=True) \
            + h[:1] * 0
        # gather + reduce to [1, d] then broadcast-add keeps the chain.
        def mk(it, agg=agg):
            import jax as _j

            def body(i, h):
                return h + agg(h) * 1e-9
            return _j.jit(
                lambda h: _j.lax.fori_loop(0, it, body, h).sum())
        t = timed(mk, xx)
        rps = nslots / t
        print(f"gather D={d_:<4}{np.dtype(dt_).name:<9}: {t*1e3:7.3f} ms"
              f"  {rps/1e6:7.1f} M rows/s  "
              f"{rps*d_*np.dtype(dt_).itemsize/1e9:7.1f} GB/s")

    # ---- segment_sum ---------------------------------------------------
    srcj = jnp.asarray(src)
    dstj = jnp.asarray(dst)

    def seg(h):
        import jax
        g = jnp.take(h, srcj, axis=0)
        return jax.ops.segment_sum(g, dstj, num_segments=V)
    dt = timed(lambda it: loop(seg, it), x)
    print(f"segment_sum  : {dt*1e3:7.3f} ms  {E/dt/1e6:7.1f} M edges/s")

    # ---- binned ELL ----------------------------------------------------
    from gnnpe_tpu.ops.ell import build_binned_ell
    counts = np.bincount(dst, minlength=V)
    offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    for hub in (True, False):
        layout = build_binned_ell(offs, src, hub_matmul=hub)
        xp = layout.permute(x)
        dt = timed(lambda it: loop(layout.apply_perm, it), xp)
        pad = layout.num_slots / max(
            1, E - (0 if layout.hub_counts is None
                    else int(np.asarray(layout.hub_counts,
                                        dtype=np.int64).sum())))
        print(f"binned hub={int(hub)}: {dt*1e3:7.3f} ms  "
              f"{E/dt/1e6:7.1f} M edges/s  slots={layout.num_slots} "
              f"(pad {pad:.2f}x)")

    # ---- flat single-gather variant -------------------------------------
    layout = build_binned_ell(offs, src, hub_matmul=True)
    xp = layout.permute(x)
    flat_idx = []
    seg_shapes = []
    for tbl in layout.class_tables:
        flat_idx.append(np.maximum(tbl, 0).reshape(-1))
        seg_shapes.append(tbl.shape)
    masks = [jnp.asarray(tbl >= 0) for tbl in layout.class_tables]
    fi = jnp.asarray(np.concatenate(flat_idx).astype(np.int32))

    def flat(h):
        g = jnp.take(h, fi, axis=0)
        parts = []
        o = 0
        for (n, w), m in zip(seg_shapes, masks):
            blk = g[o:o + n * w].reshape(n, w, h.shape[-1])
            parts.append(jnp.where(m[..., None], blk, 0.0).sum(1))
            o += n * w
        out = jnp.concatenate(parts, axis=0)
        head = layout.num_head
        if head:
            out = jnp.concatenate(
                [jnp.zeros((head, h.shape[-1]), h.dtype), out], 0)
        if layout.hub_rows is not None and len(layout.hub_rows):
            out = out + layout._hub_part(h)
        return out
    dt = timed(lambda it: loop(flat, it), xp)
    print(f"flat-gather  : {dt*1e3:7.3f} ms  {E/dt/1e6:7.1f} M edges/s")


if __name__ == "__main__":
    main()
