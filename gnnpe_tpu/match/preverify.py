"""Device-side candidate pre-verification (semi-join pruning).

The reference ships every candidate set straight to the backtracking
refinement (custom.h:890-932).  At scale the host transfer and the
backtracking fan-out both pay for candidates that cannot possibly
extend to a full match.  This pass prunes them ON DEVICE before the
transfer (SURVEY.md §7.3 "device-side pre-verification").

Semantics (arc consistency over the candidate relation): candidate v
for query vertex q survives iff for EVERY query edge (q, q') some
candidate of q' is adjacent to v in the data graph.  Any vertex that
participates in a counted match trivially satisfies this, so pruning
never changes the final answer — for either the exact (PGE) or the
reference-parity (PE) semantics.

TPU form: stack the candidate indicator vectors into C ∈ {0,1}^[V, Q];
one neighbor aggregation (the same SpMM as the embedding stage) gives
reach = A @ C, and the update is
    C[v, q] &= ∀ q' ∈ N(q): reach[v, q'] > 0
— one SpMM + one masked reduce per iteration, run to fixpoint (or a
fixed iteration budget; pruning is monotone so any prefix is sound).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from gnnpe_tpu.graph.csr import CSRGraph


def semijoin_prune(data_graph: CSRGraph, query_graph: CSRGraph,
                   candidates: List[np.ndarray], iters: int = 2,
                   ell=None) -> List[np.ndarray]:
    """Prune candidate sets by arc consistency (device SpMM form).

    iters: pruning rounds; each is sound, fixpoint needs ≤ V rounds
    but 2-3 capture almost all of the benefit.
    ell: optional prebuilt HierarchicalEll layout for the data graph
    (reused across queries); falls back to segment_sum.
    """
    import jax
    import jax.numpy as jnp

    v = data_graph.num_vertices
    nq = query_graph.num_vertices
    c = np.zeros((v, nq), dtype=np.float32)
    for q, cand in enumerate(candidates):
        c[np.asarray(cand, dtype=np.int64), q] = 1.0

    # Query adjacency mask: need[q, q'] — which reach columns must be
    # positive for a q-candidate to survive.
    need = np.zeros((nq, nq), dtype=bool)
    for q in range(nq):
        need[q, query_graph.vertex_neighbors(q)] = True
    needj = jnp.asarray(need)

    if ell is not None:
        agg = ell.apply
    else:
        src, dst = data_graph.coo()
        srcj, dstj = jnp.asarray(src), jnp.asarray(dst)

        def agg(h):
            return jax.ops.segment_sum(jnp.take(h, srcj, axis=0), dstj,
                                       num_segments=v)

    @jax.jit
    def step(cj):
        reach = agg(cj) > 0.0                      # [V, Q] neighbor hit
        # ok[v, q] = ∀ q' needed: reach[v, q']
        ok = (reach[:, None, :] | ~needj[None]).all(-1)   # [V, Q]
        return cj * ok.astype(cj.dtype)

    cj = jnp.asarray(c)
    for _ in range(iters):
        nxt = step(cj)
        if bool((nxt == cj).all()):
            cj = nxt
            break
        cj = nxt

    out = np.asarray(cj) > 0.0
    return [np.nonzero(out[:, q])[0].astype(np.int64)
            for q in range(nq)]
