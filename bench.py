"""Benchmark harness.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): **aggregation edges/sec/chip** for the
message-passing SpMM — the hot op of the embedding/training stage —
measured on a synthetic power-law-ish graph at production-ish sizes.
``vs_baseline`` is the fraction of the HBM-bandwidth roofline achieved
(north-star target ≥ 0.80).

Roofline model (memory-bound SpMM over COO arcs, f32, feature dim D):
  bytes/edge ≈ 4·D (gather x[src]) + 8 (src+dst ids)
             + amortized accumulator traffic ≈ 8·D·V/E
  roofline edges/s = BW_chip / bytes_per_edge
BW: v5e ≈ 819 GB/s, v4 ≈ 1228 GB/s, CPU fallback uses a nominal
50 GB/s so the line stays comparable (the driver runs this on TPU).

Secondary numbers (stderr): end-to-end PE/PGE query latency on Test/
vs the reference's measured wall times (BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _chip_bandwidth_bytes():
    """Measured HBM bandwidth of the attached chip — ONE source of
    truth shared with ops/ell hub pricing (utils/device_probe probes
    it per machine and disk-caches; VERDICT r3 weak item 5)."""
    from gnnpe_tpu.utils.device_probe import device_constants
    return device_constants()[0]


def synth_graph(num_vertices: int, num_edges: int, seed: int = 0):
    """Power-law-ish multigraph arcs (both directions), sorted by dst
    for scatter locality."""
    rng = np.random.RandomState(seed)
    # Preferential-attachment-flavored: degree ∝ zipf weights, sampled
    # by inverse-CDF (rng.choice with p= is pathologically slow here).
    w = 1.0 / np.arange(1, num_vertices + 1) ** 0.8
    cdf = np.cumsum(w / w.sum())
    src = np.searchsorted(cdf, rng.rand(num_edges)).astype(np.int32)
    src = np.minimum(src, num_vertices - 1)
    dst = rng.randint(0, num_vertices, size=num_edges).astype(np.int32)
    order = np.argsort(dst, kind="stable")
    return src[order], dst[order]


def _step_time(agg, x, short_iters=4, long_iters=44, medians=7):
    """Per-iteration time of ``h = agg(h) * 0.1`` (one GNN layer:
    aggregate + fused elementwise), long/short-loop differenced.

    Methodology (required by this environment): the iteration loop runs
    INSIDE one jit with a data dependency chaining iterations, the
    result is forced to the host via a scalar readback (block_until_
    ready does not actually block through the axon relay), and the
    per-iteration time is the DIFFERENCE between a long and a short
    loop, cancelling the ~40 ms fixed dispatch+readback cost.  The
    difference is taken per paired rep and the MEDIAN of ``medians``
    pairs reported — single-shot differences swing ±10% on v5e
    (the round-1 282-vs-386 Medges/s discrepancy was exactly this).
    """
    import jax

    def make(iters):
        body = lambda i, h: agg(h) * 0.1
        return jax.jit(
            lambda h: jax.lax.fori_loop(0, iters, body, h).sum())

    f_short, f_long = make(short_iters), make(long_iters)
    float(f_short(x))  # compile + warm
    float(f_long(x))
    diffs = []
    for _ in range(medians):
        t0 = time.perf_counter()
        float(f_short(x))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f_long(x))
        t_l = time.perf_counter() - t0
        diffs.append((t_l - t_s) / (long_iters - short_iters))
    return max(float(np.median(diffs)), 1e-9)


def bench_aggregation(num_vertices=100_000, num_edges=800_000,
                      dim=128, implementation="binned"):
    """Measure aggregation edges/s and the fraction of the
    kernel-proven gather-bound roofline achieved (the ``vs_baseline``
    of the JSON line; target ≥ 0.80).

    Roofline defense (BASELINE.md "v5e kernel calibration"): at D=128
    the binding resource is the gather engine's row rate, not HBM
    bytes — dense streams hit ~500 GB/s through this harness while
    row gathers top out at ~265 GB/s ≈ 5.2e8 rows/s, and widening rows
    to D=256 REGRESSES to 1.3e8 rows/s (measured round 2), so packing
    more bytes per row cannot beat it.  The roofline is therefore
    measured in-run, on this chip, as the time XLA's own gather needs
    for exactly this layout's slot list (one flat take, no binning
    overhead) plus the measured hub-matmul time — the fastest any
    implementation of this aggregation could run without changing the
    access pattern.  The naive HBM-byte fraction is reported on stderr
    for continuity with round 1.
    """
    import jax
    import jax.numpy as jnp

    src, dst = synth_graph(num_vertices, num_edges)
    x = jnp.asarray(np.random.RandomState(1).rand(
        num_vertices, dim).astype(np.float32))
    counts = np.bincount(dst, minlength=num_vertices)
    offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)

    layout = None
    if implementation == "ell":
        from gnnpe_tpu.ops.ell import build_ell
        layout_u = build_ell(offs, src, width=8, level2_width=8)
        agg = layout_u.apply
    elif implementation == "binned_halo":
        # The sharded production layout on a 1-shard mesh: measures
        # what the distributed path costs per chip (VERDICT r2 item 2
        # asked for within ~15% of the unsharded binned number).
        from gnnpe_tpu.parallel.binned_halo import BinnedHaloPlan
        from gnnpe_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(1, axes=("graph",), shape=(1,))
        plan = BinnedHaloPlan.build(
            offs, src, np.zeros(num_vertices, np.int64), 1)
        agg3 = plan.make_aggregate(mesh)
        x = jnp.asarray(plan.shard_features(np.asarray(x)))
        agg = agg3
    elif implementation == "binned":
        # Degree-binned relabeled layout: the layer loop runs in the
        # permuted vertex space; boundary permutes amortize across
        # layers/iterations, so the loop body is apply_perm.
        from gnnpe_tpu.ops.ell import build_binned_ell
        layout = build_binned_ell(offs, src)
        x = layout.permute(x)
        agg = layout.apply_perm
    else:
        from gnnpe_tpu.ops.spmm import neighbor_sum
        srcj, dstj = jnp.asarray(src), jnp.asarray(dst)
        agg = lambda x: neighbor_sum(srcj, dstj, x, num_vertices)

    dt = _step_time(agg, x)
    edges_per_sec = num_edges / dt

    # ---- kernel-proven gather-bound roofline (same run, same chip) --
    if layout is not None:
        # The full slot list of the layout: every class gather AND
        # every head fold LEVEL (apply_perm chains gathers through
        # all of head_tables, not just level 0 — pricing only the
        # first level overstated the roofline).  Level-k indices
        # address intermediate buffers; clamp into x's rows — the
        # probe times the access pattern, not the values.
        parts = [t.reshape(-1) for t in layout.class_tables]
        parts += [t.reshape(-1) for t in layout.head_tables]
        flat = np.minimum(np.concatenate(parts),
                          num_vertices - 1)
        gidx = jnp.asarray(flat.astype(np.int32))

        def probe(h):
            g = jnp.take(h, gidx, axis=0).sum(0, keepdims=True)
            return jnp.broadcast_to(g * 1e-9, h.shape) + h
        # Long differencing spreads (104 vs the default 44): the
        # roofline denominators need ~2× less jitter than the
        # aggregation numerator or the recorded fraction swings ±0.08
        # run to run (observed round 4: roofline 372 vs 425 M edges/s
        # for identical code).
        t_stream = _step_time(lambda h: h + 1.0, x, long_iters=104)
        # Floor: a gather cannot beat spec HBM bandwidth on its bytes.
        t_floor = len(flat) * dim * 4 / _chip_bandwidth_bytes()
        t_gather = max(_step_time(probe, x, long_iters=104) - t_stream,
                       t_floor)
        hub_t = 0.0
        if layout.hub_rows is not None and len(layout.hub_rows):
            def hub_probe(h):
                p = layout._hub_part(h)
                return jnp.broadcast_to(p[:1] * 1e-9, h.shape) + h
            hub_t = max(_step_time(hub_probe, x, long_iters=104)
                        - t_stream, 0.0)
        # Two bounds: the ADDITIVE sum (gather then hub, no overlap —
        # the round-1..3 model) and the OVERLAP bound max(gather, hub)
        # (gather engine and MXU are different units; a perfect
        # implementation overlaps them, so the sum is not a true
        # ceiling once the hub share grows — measured round 4: the
        # fused apply BEAT the additive model at 1.04).  vs_baseline
        # reports the strict overlap bound.
        roof_add = num_edges / (t_gather + hub_t)
        gather_roofline = num_edges / max(t_gather, hub_t)
        frac = edges_per_sec / gather_roofline
        print(f"[bench] gather probe {len(flat)} rows in "
              f"{t_gather*1e3:.3f} ms ({len(flat)/max(t_gather,1e-9)/1e6:.0f}"
              f" M rows/s), hub {hub_t*1e3:.3f} ms -> overlap roofline "
              f"{gather_roofline/1e6:.0f} M edges/s (additive "
              f"{roof_add/1e6:.0f}, frac {edges_per_sec/roof_add:.3f})",
              file=sys.stderr)
    else:
        gather_roofline = None
        frac = 0.0

    bytes_per_edge = (4 * dim + 8 +
                      8 * dim * num_vertices / num_edges)
    hbm_roofline = _chip_bandwidth_bytes() / bytes_per_edge
    print(f"[bench] HBM-byte roofline fraction "
          f"{edges_per_sec/hbm_roofline:.3f} (round-1 continuity; "
          f"gather-bound is the defended model)", file=sys.stderr)
    if gather_roofline is None:
        frac = edges_per_sec / hbm_roofline
    return edges_per_sec, frac, dt


def bench_query_latency():
    """End-to-end Test/ offline + query latency, both variants (stderr).
    Reference baselines (BASELINE.md): PE offline ~1.0 s enumeration +
    ~30 s cold R-tree build; PE online warm ~3.1 s; PGE online 18 ms."""
    from gnnpe_tpu.config import PEConfig, PGEConfig
    from gnnpe_tpu.engine import PEEngine, PGEEngine
    from gnnpe_tpu.graph.csr import CSRGraph
    g = CSRGraph.from_graph_file("/root/reference/Test/data_graph.graph")
    q = CSRGraph.from_graph_file("/root/reference/Test/query_graph.graph")
    t0 = time.perf_counter()
    pe = PEEngine(PEConfig.from_cli(), g).offline().build_index()
    offline_ms = (time.perf_counter() - t0) * 1e3
    print(f"[bench] PE offline+index {offline_ms:.0f} ms "
          f"(ref ~1000 ms enumerate + ~30000 ms cold index)",
          file=sys.stderr)
    pe_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = pe.online(q)
        pe_times.append((time.perf_counter() - t0) * 1e3)
    assert r.answer_count == 45426, r.answer_count
    pge = PGEEngine(PGEConfig.from_cli(), g).offline()
    pge_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        r2 = pge.online(q)
        pge_times.append((time.perf_counter() - t0) * 1e3)
    assert r2.answer_count == 221832, r2.answer_count
    return float(np.median(pe_times)), float(np.median(pge_times))


def main(argv=None):
    import argparse
    from gnnpe_tpu.utils.compile_cache import enable_persistent_cache
    from gnnpe_tpu.utils.profiling import MetricsLog, trace
    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--metrics", default="bench_metrics.jsonl",
                    help="JSON-lines metrics file ('' disables)")
    ap.add_argument("--trace", default="",
                    help="capture a jax.profiler trace of the "
                         "aggregation bench into this directory")
    ap.add_argument("--skip-halo", action="store_true",
                    help="skip the 1-shard binned_halo comparison")
    args = ap.parse_args(argv)
    log = MetricsLog(args.metrics or None)
    if args.trace:
        with trace(args.trace):
            edges_per_sec, frac, dt = bench_aggregation()
    else:
        edges_per_sec, frac, dt = bench_aggregation()
    log.log("aggregation", edges_per_sec=round(edges_per_sec),
            step_ms=round(dt * 1e3, 3), roofline_frac=round(frac, 4))
    if not args.skip_halo:
        try:
            halo_eps, _, halo_dt = bench_aggregation(
                implementation="binned_halo")
            print(f"[bench] binned_halo (1-shard sharded layout) "
                  f"{halo_eps/1e6:.0f} M edges/s = "
                  f"{halo_eps/edges_per_sec:.2f}x of unsharded binned",
                  file=sys.stderr)
            log.log("binned_halo_1shard",
                    edges_per_sec=round(halo_eps),
                    vs_binned=round(halo_eps / edges_per_sec, 4))
        except Exception as e:
            print(f"[bench] binned_halo bench failed: {e}",
                  file=sys.stderr)
    try:
        pe_ms, pge_ms = bench_query_latency()
        print(f"[bench] PE online {pe_ms:.1f} ms (ref warm ~3100 ms); "
              f"PGE online {pge_ms:.1f} ms (ref ~18 ms); "
              f"SpMM step {dt*1e3:.2f} ms", file=sys.stderr)
        log.log("query_latency", pe_online_ms=round(pe_ms, 1),
                pge_online_ms=round(pge_ms, 1))
    except Exception as e:  # secondary metrics must not kill the line
        print(f"[bench] query-latency bench failed: {e}", file=sys.stderr)
        log.log("query_latency_error", error=str(e))
    log.close()
    print(json.dumps({
        "metric": "aggregation_edges_per_sec_chip",
        "value": round(edges_per_sec),
        "unit": "edges/s",
        "vs_baseline": round(frac, 4),
    }))


if __name__ == "__main__":
    main()
