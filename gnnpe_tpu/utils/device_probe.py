"""Measured device constants for layout economics (VERDICT r2 item 9).

``ops/ell._select_hubs`` prices a hub column against gather time using
(HBM bandwidth, matmul flops, gather seconds/row).  Round 2 keyed
these off a hardcoded table of device-kind substrings — an unlisted
TPU generation silently got v5e numbers.  This module MEASURES them
once per machine with three micro-probes (dense stream, row gather,
bf16 matmul), using the long/short-loop differencing the bench harness
uses (the relay's fixed ~40 ms dispatch cost cancels in the paired
difference), and persists the result to ``.cache/device_probe.json``
keyed by device kind, so the probe runs once ever per machine.

Fallback order: in-process cache → disk cache → fresh probe → the
round-2 table (probe failure, e.g. no backend at build time).
"""

from __future__ import annotations

import functools
import json
import os
import time
from typing import Tuple

_CACHE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".cache", "device_probe.json")

# Round-2 table of record (BASELINE.md calibration) — fallback only.
_TABLE = {
    "v5e": (819e9, 197e12, 1.93e-9),
    "v5p": (2765e9, 459e12, 1.93e-9 * 819 / 2765),
    "v4": (1228e9, 275e12, 1.93e-9 * 819 / 1228),
    "v6": (1640e9, 918e12, 1.93e-9 * 819 / 1640),
    "cpu": (50e9, 1e12, 2e-9),
}


def _table_lookup(kind: str):
    k = kind.lower()
    if "v5 lite" in k or "v5e" in k:
        return _TABLE["v5e"]
    if "v5p" in k:
        return _TABLE["v5p"]
    if "v4" in k:
        return _TABLE["v4"]
    if "v6" in k or "trillium" in k:
        return _TABLE["v6"]
    if "tpu" in k:
        return _TABLE["v5e"]
    return _TABLE["cpu"]


def _step_time(fn, x, short=2, long=10, reps=3, aux=()):
    """Long/short differenced per-iteration time of ``fn(h, *aux)``.

    ``aux`` arrays enter the jit as ARGUMENTS — closured device arrays
    are compile-time constants that can take minutes to lower through
    the relay (the exact anti-pattern this module's constants price;
    ADVICE r3 item 1)."""
    import jax
    import numpy as np

    def make(iters):
        def run(h, *a):
            body = lambda i, hh: fn(hh, *a) * 1.0
            return jax.lax.fori_loop(0, iters, body, h).sum()
        return jax.jit(run)

    f_s, f_l = make(short), make(long)
    float(f_s(x, *aux))
    float(f_l(x, *aux))
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f_s(x, *aux))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f_l(x, *aux))
        tl = time.perf_counter() - t0
        diffs.append((tl - ts) / (long - short))
    return max(float(np.median(diffs)), 1e-12)


def _probe(kind: str) -> Tuple[float, float, float]:
    import jax
    import jax.numpy as jnp
    import numpy as np
    on_tpu = "tpu" in kind.lower() or "lite" in kind.lower()
    rows = 1 << (17 if on_tpu else 14)
    d = 128
    x = jnp.asarray(np.random.RandomState(0).rand(rows, d)
                    .astype(np.float32))
    # Dense stream: read+write 2·bytes per element.  The long/short
    # spread must clear the relay's ±few-ms dispatch noise: at 67 MB
    # per iteration one v5e stream pass is ~0.16 ms, so 128 extra
    # iterations ≈ 20 ms of signal (round-4 fix: 8 extra iterations
    # sat inside the noise and the differenced time clamped to the
    # 1e-12 floor, yielding a 1.3e20 B/s "measurement").
    t_stream = _step_time(lambda h: h + 1.0, x, short=8, long=136)
    bw = 2 * rows * d * 4 / t_stream
    # Row gather; idx is a jit ARGUMENT, not a closure constant
    # (ADVICE r3 item 1).  Sampled WITH replacement — adjacency slot
    # lists hit rows with multiplicity, and a pure permutation gather
    # measured ~1.8× faster than the real slot-list pattern (round
    # 4), which skewed the hub-pricing economics.
    nidx = 4 * rows
    idx = jnp.asarray(np.random.RandomState(1)
                      .randint(0, rows, nidx).astype(np.int32))

    def g(h, i):
        out = jnp.take(h, i, axis=0)
        return h + out[:rows] * 1e-9
    t_gather = _step_time(g, x, aux=(idx,), short=8, long=72)
    gather_row_s = t_gather / nidx
    # bf16 matmul flops (2048³·2 = 17 GFLOP/iter — ~0.09 ms on a
    # v5e, so the 128-iteration spread is ~11 ms of signal).
    m = 2048 if on_tpu else 256
    a = jnp.asarray(np.random.RandomState(2).rand(m, m)
                    .astype(np.float32)).astype(jnp.bfloat16)
    t_mm = _step_time(
        lambda h, w: (h @ w).astype(jnp.bfloat16),
        a.astype(jnp.bfloat16), aux=(a,), short=8, long=136)
    flops = 2 * m ** 3 / t_mm
    return float(bw), float(flops), float(gather_row_s)


@functools.lru_cache(maxsize=1)
def device_constants() -> Tuple[float, float, float]:
    """(hbm_bytes_per_s, bf16_flops_per_s, gather_s_per_row) for the
    first visible accelerator — measured, disk-cached, table fallback.
    Set GNNPE_NO_PROBE=1 to force the table (e.g. unit-test speed)."""
    try:
        import jax
        kind = getattr(jax.devices()[0], "device_kind", "") or "cpu"
    except Exception:
        return _TABLE["cpu"]
    if os.environ.get("GNNPE_NO_PROBE"):
        return _table_lookup(kind)
    try:
        with open(_CACHE_PATH) as f:
            disk = json.load(f)
        if kind in disk:
            return tuple(disk[kind])
    except Exception:
        disk = {}
    try:
        vals = _probe(kind)
        # Plausibility clamp: a probe constant more than 8× off the
        # spec table is a measurement failure (relay noise), not a
        # faster chip — fall back per-constant, keep the sane ones.
        tbl = _table_lookup(kind)
        vals = tuple(v if t / 8 <= v <= t * 8 else t
                     for v, t in zip(vals, tbl))
    except Exception:
        return _table_lookup(kind)
    try:
        os.makedirs(os.path.dirname(_CACHE_PATH), exist_ok=True)
        disk[kind] = list(vals)
        with open(_CACHE_PATH, "w") as f:
            json.dump(disk, f)
    except OSError:
        pass
    return vals
