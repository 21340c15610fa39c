"""Model-family tests: trainable GNN, reference-parity configuration,
dominance preservation, and training steps."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gnnpe_tpu.models.gnn import PathGNN, dominance_loss
from gnnpe_tpu.ops.mt19937 import label_feature_table


@pytest.fixture(scope="module")
def toy():
    from __graft_entry__ import _toy_graph
    return _toy_graph(num_vertices=48, num_labels=6, seed=3)


def test_reference_params_reproduce_vde(data_graph):
    """PathGNN with reference params == the fixed VDE hop (f32)."""
    from gnnpe_tpu.embed.vde import gen_vde
    model = PathGNN(dim=2, num_layers=1, labels_count=data_graph.labels_count)
    table = label_feature_table(data_graph.labels_count, 2)
    params = model.reference_params(table)
    src, dst = data_graph.coo()
    h = model.vertex_embeddings(params, jnp.asarray(data_graph.labels),
                                jnp.asarray(src), jnp.asarray(dst),
                                data_graph.num_vertices)
    golden = gen_vde(data_graph, 2).vde
    # f32 + softplus-inverse roundtrip: ~1e-4 relative on small values.
    np.testing.assert_allclose(np.asarray(h), golden, rtol=1e-3,
                               atol=1e-5)


def test_forward_shapes(toy):
    model = PathGNN(dim=8, num_layers=2, labels_count=6,
                    activation="softplus")
    params = model.init(jax.random.key(0), labels_count=6)
    src, dst = toy.coo()
    paths = np.random.RandomState(0).randint(
        0, toy.num_vertices, (10, 3)).astype(np.int32)
    pde = model.path_embeddings(params, jnp.asarray(toy.labels),
                                jnp.asarray(src), jnp.asarray(dst),
                                toy.num_vertices, jnp.asarray(paths))
    assert pde.shape == (10, 24)
    assert np.isfinite(np.asarray(pde)).all()


def test_nonneg_weights_preserve_dominance(toy):
    """For a real monomorphism-style pair (vertex u whose neighborhood
    maps into v's with equal labels), embeddings must dominate."""
    model = PathGNN(dim=4, num_layers=2, labels_count=1,
                    activation="softplus", nonneg=True)
    params = model.init(jax.random.key(1), labels_count=1)
    # Star graphs: center of K1,2 embeds into center of K1,4 (all labels 0)
    from gnnpe_tpu.graph.csr import CSRGraph
    edges = np.array([[0, 1], [0, 2],           # star A center 0
                      [3, 4], [3, 5], [3, 6], [3, 7]])  # star B center 3
    g = CSRGraph.from_edges(8, edges, np.zeros(8, dtype=np.int64))
    src, dst = g.coo()
    h = model.vertex_embeddings(params, jnp.asarray(g.labels),
                                jnp.asarray(src), jnp.asarray(dst), 8)
    h = np.asarray(h)
    assert (h[0] <= h[3] + 1e-5).all(), "center embedding must dominate"


def test_train_step_reduces_loss(toy):
    model = PathGNN(dim=8, num_layers=2, labels_count=6,
                    activation="softplus")
    params = model.init(jax.random.key(0), labels_count=6)
    src, dst = toy.coo()
    rng = np.random.RandomState(0)
    paths = rng.randint(0, toy.num_vertices, (32, 3)).astype(np.int32)
    pairs = rng.randint(0, 32, (64, 2)).astype(np.int32)
    labels = jnp.asarray(toy.labels)
    srcj, dstj = jnp.asarray(src), jnp.asarray(dst)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: dominance_loss(model, p, labels, srcj, dstj,
                                     toy.num_vertices, jnp.asarray(paths),
                                     jnp.asarray(pairs)))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_grad_flows_to_all_params(toy):
    model = PathGNN(dim=4, num_layers=2, labels_count=6,
                    activation="softplus")
    params = model.init(jax.random.key(0), labels_count=6)
    src, dst = toy.coo()
    rng = np.random.RandomState(1)
    paths = rng.randint(0, toy.num_vertices, (16, 3)).astype(np.int32)
    pairs = rng.randint(0, 16, (16, 2)).astype(np.int32)
    grads = jax.grad(lambda p: dominance_loss(
        model, p, jnp.asarray(toy.labels), jnp.asarray(src),
        jnp.asarray(dst), toy.num_vertices, jnp.asarray(paths),
        jnp.asarray(pairs)))(params)
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
    # at least embed and first-layer weights receive signal
    assert np.abs(np.asarray(grads.embed)).max() > 0
    assert np.abs(np.asarray(grads.w_nbr[0])).max() > 0


def test_fit_binned_aggregation_matches_segment(toy):
    """fit(aggregation="binned") must optimize the same objective —
    losses track the segment-sum path closely step by step."""
    from gnnpe_tpu.models.gnn import PathGNN
    from gnnpe_tpu.models.train import fit
    rng = np.random.RandomState(0)
    paths = rng.randint(0, toy.num_vertices, (64, 3)).astype(np.int32)
    kw = dict(num_steps=5, batch_size=64, seed=0)
    m1 = PathGNN(dim=4, num_layers=1, labels_count=6)
    s_seg = fit(m1, toy, paths, **kw)
    m2 = PathGNN(dim=4, num_layers=1, labels_count=6)
    s_bin = fit(m2, toy, paths, aggregation="binned", **kw)
    np.testing.assert_allclose(s_seg.history, s_bin.history,
                               rtol=1e-3, atol=1e-5)


def test_trained_embedder_serves_exactly(toy):
    """Train a PathGNN, plug it into PGEEngine via model_embedder:
    answers must equal the fixed-embedding pipeline (dominance holds
    by the non-negative construction for ANY weights)."""
    from gnnpe_tpu.config import PGEConfig
    from gnnpe_tpu.engine import PGEEngine
    from gnnpe_tpu.io.datasets import sample_query
    from gnnpe_tpu.models.embedder import model_embedder
    from gnnpe_tpu.models.train import fit

    rng = np.random.RandomState(0)
    paths = rng.randint(0, toy.num_vertices, (64, 2)).astype(np.int32)
    model = PathGNN(dim=4, num_layers=1, labels_count=6,
                    activation="softplus")
    state = fit(model, toy, paths, num_steps=10, batch_size=32, seed=0)

    q = sample_query(toy, 3, tree=True, seed=4)
    fixed = PGEEngine(PGEConfig.from_cli(l=1, e=2, p=2), toy).offline()
    want = fixed.online(q, engine="python").answer_count

    trained = PGEEngine(PGEConfig.from_cli(l=1, e=4, p=2), toy,
                        embedder=model_embedder(model, state.params)
                        ).offline()
    r = trained.online(q, engine="python")
    assert r.answer_count == want >= 1, (r.answer_count, want)


def test_sample_negative_pairs_are_provable_negatives(data_graph):
    """Negatives pass the label+degree leaf test (only pde can prune
    them) but fail NLF containment (no monomorphism exists)."""
    from gnnpe_tpu.graph.partition import degree_sorted_nodes
    from gnnpe_tpu.models.train import sample_negative_pairs
    from gnnpe_tpu.paths.enumerate import enumerate_paths

    paths, _ = enumerate_paths(data_graph,
                               degree_sorted_nodes(data_graph), 3,
                               dedup=True)
    neg = sample_negative_pairs(data_graph, paths, 512, seed=7)
    assert len(neg) == 512
    i, j = neg[:, 0], neg[:, 1]
    lab = np.take(data_graph.labels, paths)
    deg = np.take(data_graph.degrees, paths)
    nlf = data_graph.nlf
    assert (lab[i] == lab[j]).all()
    assert (deg[i] <= deg[j]).all()
    assert (nlf[paths[i]] > nlf[paths[j]]).any(axis=(1, 2)).all()


def test_discriminative_training_separates_negatives(data_graph):
    """Training with negatives=True increases the dominance-violation
    margin on held-out negative pairs (the pruning signal) while the
    served pipeline stays exact (dominance is structural)."""
    from gnnpe_tpu.graph.partition import degree_sorted_nodes
    from gnnpe_tpu.models.train import fit, sample_negative_pairs
    from gnnpe_tpu.paths.enumerate import enumerate_paths

    paths, _ = enumerate_paths(data_graph,
                               degree_sorted_nodes(data_graph), 3,
                               dedup=True)
    model = PathGNN(dim=2, num_layers=1,
                    labels_count=data_graph.labels_count,
                    activation="softplus")
    src, dst = data_graph.coo()
    held_out = sample_negative_pairs(data_graph, paths, 256, seed=99)

    def mean_sep(params):
        pde = model.path_embeddings(
            params, jnp.asarray(data_graph.labels), jnp.asarray(src),
            jnp.asarray(dst), data_graph.num_vertices,
            jnp.asarray(paths.astype(np.int32)))
        ni = jnp.take(pde, held_out[:, 0], axis=0)
        nj = jnp.take(pde, held_out[:, 1], axis=0)
        sep = jnp.max(ni - nj, axis=1)
        return float(jnp.mean(sep > 0))  # fraction prunable

    state = fit(model, data_graph, paths, num_steps=100,
                batch_size=512, seed=0, negatives=True,
                learning_rate=1e-2)
    table = label_feature_table(data_graph.labels_count, 2)
    before = mean_sep(model.reference_params(table))
    after = mean_sep(state.params)
    assert after > before, (before, after)
    assert state.history[-1] < state.history[0]
