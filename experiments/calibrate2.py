"""Round-2 micro-variants: index locality, width sweep, mask-free pad."""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import synth_graph  # noqa: E402
from experiments.calibrate import timed, loop  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    V, E, D = 100_000, 800_000, 128
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(V, D).astype(np.float32))
    src, dst = synth_graph(V, E)
    counts = np.bincount(dst, minlength=V)
    offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)

    nslots = int(E * 1.37)
    raw = rng.randint(0, V, size=nslots).astype(np.int32)
    for name, idx in (("random ", raw), ("sorted ", np.sort(raw)),
                      ("zipf   ", np.minimum(
                          np.searchsorted(
                              np.cumsum((w := 1.0 / np.arange(
                                  1, V + 1) ** 0.8) / w.sum()),
                              rng.rand(nslots)), V - 1).astype(np.int32))):
        gidx = jnp.asarray(idx)

        def agg(h, gidx=gidx):
            return jnp.take(h, gidx, axis=0).sum(0, keepdims=True) \
                + h[:1] * 0
        dt = timed(lambda it: loop(agg, it), x)
        print(f"gather {name}: {dt*1e3:7.3f} ms  "
              f"{nslots/dt/1e6:7.1f} M rows/s")

    from gnnpe_tpu.ops.ell import build_binned_ell
    for widths in ((4, 8, 16, 32, 64), (1, 2, 4, 8, 16, 32, 64),
                   (2, 4, 8, 16, 32, 64), (4, 8, 16, 32),
                   (8, 16, 32, 64), (2, 4, 8, 16, 32),
                   (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64)):
        layout = build_binned_ell(offs, src, widths=widths)
        xp = layout.permute(x)
        dt = timed(lambda it: loop(layout.apply_perm, it), xp)
        print(f"binned w={str(widths):<42}: {dt*1e3:7.3f} ms  "
              f"{E/dt/1e6:7.1f} M edges/s  slots={layout.num_slots}")

    # mask-free pad: pad slots -> row 0, subtract padcnt * h[0]
    layout = build_binned_ell(offs, src)
    xp = layout.permute(x)
    tables = [jnp.asarray(np.maximum(t, 0)) for t in layout.class_tables]
    padcnt = [jnp.asarray((t < 0).sum(1).astype(np.float32))
              for t in layout.class_tables]

    def nomask(h):
        parts = []
        h0 = h[0]
        for tbl, pc in zip(tables, padcnt):
            g = jnp.take(h, tbl.reshape(-1), axis=0).reshape(
                *tbl.shape, h.shape[-1])
            parts.append(g.sum(1) - pc[:, None] * h0)
        out = jnp.concatenate(parts, axis=0)
        if layout.num_head:
            out = jnp.concatenate(
                [jnp.zeros((layout.num_head, D), h.dtype), out], 0)
        if layout.hub_rows is not None and len(layout.hub_rows):
            out = out + layout._hub_part(h)
        return out
    dt = timed(lambda it: loop(nomask, it), xp)
    print(f"binned nomask: {dt*1e3:7.3f} ms  {E/dt/1e6:7.1f} M edges/s")


if __name__ == "__main__":
    main()
