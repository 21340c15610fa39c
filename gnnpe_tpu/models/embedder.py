"""Trained-model embedder: plug a PathGNN into the match engines.

The engines' default embedder reproduces the reference's fixed
label-seeded VDE.  This adapter runs a trained (or reference-param)
PathGNN instead — completing the loop the BASELINE north star asks
for: *train* the path embeddings with the same kernels, then *serve*
them through the same index/filter/refinement pipeline.

Exactness argument: with the non-negative parameterization
(models/gnn.py), layer l computes h' = σ(h Ws + (Σ_{N} h) Wn + b)
with Ws, Wn, b ≥ 0, σ monotone, h > 0, and per-label input rows
(x_u = embed[label(u)]).  If u ↦ v is part of a monomorphism then
label(u) = label(v) and N(u) maps injectively into N(v), so by
induction h_l(u) ≤ h_l(v) element-wise at every layer — exactly the
dominance property the candidate filter prunes with (SURVEY.md §0.1).
Candidates therefore remain match-supersets and refinement stays
exact, for any trained weights.

Serving numerics: the forward runs in float64 ON HOST (numpy), like
the fixed pipeline (embed/vde.py) — NOT the f32 device forward used
during training.  The filter's epsilon is absolute (1e-6, matching
custom.h:43); trained features can be orders of magnitude larger than
the fixed VDE's, and f32 rounding at that scale exceeds the epsilon
and prunes true matches (measured: wrong answer counts on Test/).
In f64 the subset-sum rounding gap is ~1e-13 · |h|, comfortably
inside epsilon.  The weight matrices are tiny (D×D), so the host
matmuls are negligible next to the aggregation, which reuses the
same CSR reduceat kernel as gen_vde.
"""

from __future__ import annotations

import numpy as np

from gnnpe_tpu.embed.vde import VertexEmbeddings
from gnnpe_tpu.ops.spmm import neighbor_sum_np
from gnnpe_tpu.graph.csr import CSRGraph


def _softplus64(h: np.ndarray) -> np.ndarray:
    return np.logaddexp(0.0, h)


def model_embedder(model, params):
    """callable(graph) -> VertexEmbeddings computed by ``model``.

    The x/nx split mirrors the fixed pipeline: x = per-label input
    features (used by pde_label / label-group pruning — same-label
    vertices share x, so the equality/overlap tests stay sound), and
    vde = the model's final vertex features.
    """
    # Materialize parameters once, in f64 (softplus = the _pos map).
    def pos(raw):
        raw = np.asarray(raw, dtype=np.float64)
        return _softplus64(raw) if model.nonneg else raw

    w_self = [pos(w) for w in params.w_self]
    w_nbr = [pos(w) for w in params.w_nbr]
    bias = [pos(b) if model.nonneg
            else np.asarray(b, dtype=np.float64) for b in params.bias]
    table = pos(params.embed)

    def act(h):
        if model.activation == "relu":
            return np.maximum(h, 0.0)
        if model.activation == "softplus":
            return _softplus64(h)
        return h

    def embed(graph: CSRGraph) -> VertexEmbeddings:
        x = table[graph.labels]
        h = x
        for i in range(model.num_layers):
            nbr = neighbor_sum_np(graph.offsets, graph.neighbors, h)
            h = act(h @ w_self[i] + nbr @ w_nbr[i] + bias[i])
        return VertexEmbeddings(labels=graph.labels,
                                degrees=graph.degrees,
                                x=x, nx=h - x, vde=h)

    return embed
