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
"""

from __future__ import annotations

import numpy as np

from gnnpe_tpu.embed.vde import VertexEmbeddings
from gnnpe_tpu.graph.csr import CSRGraph


def model_embedder(model, params):
    """callable(graph) -> VertexEmbeddings computed by ``model``.

    The x/nx split mirrors the fixed pipeline: x = per-label input
    features (used by pde_label / label-group pruning — same-label
    vertices share x, so the equality/overlap tests stay sound), and
    vde = the model's final vertex features.
    """
    import jax.numpy as jnp

    def embed(graph: CSRGraph) -> VertexEmbeddings:
        src, dst = graph.coo()
        h = model.vertex_embeddings(
            params, jnp.asarray(graph.labels), jnp.asarray(src),
            jnp.asarray(dst), graph.num_vertices)
        x_table = model._pos(params.embed)
        x = np.asarray(jnp.take(x_table, jnp.asarray(graph.labels),
                                axis=0), dtype=np.float64)
        vde = np.asarray(h, dtype=np.float64)
        return VertexEmbeddings(labels=graph.labels,
                                degrees=graph.degrees,
                                x=x, nx=vde - x, vde=vde)

    return embed
