"""Lazy row-sparse Adam: locality, torch-SparseAdam semantics, e2e training."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_recommendation_tpu.constants import EDGE_KEY
from laplace_gnn_recommendation_tpu.data.etl import LinkPredArtifacts
from laplace_gnn_recommendation_tpu.data.pinsage_data import build_pinsage_data
from laplace_gnn_recommendation_tpu.data.splitting import train_test_split_by_time
from laplace_gnn_recommendation_tpu.data.synthetic import random_hetero_graph
from laplace_gnn_recommendation_tpu.train.optim import (
    init_sparse_adam_state,
    sparse_rows_adam_update,
)
from laplace_gnn_recommendation_tpu.train.pinsage_pipeline import PinSAGEConfig, train


class TestSparseAdam:
    def test_only_touched_rows_change(self):
        table = jnp.ones((10, 4))
        state = init_sparse_adam_state(table)
        rows = jnp.asarray([2, 5, 0], jnp.int32)
        mask = jnp.asarray([True, True, False])  # row 0 is a pad → untouched
        grads = jnp.ones((3, 4))
        new_table, new_state = sparse_rows_adam_update(
            table, state, rows, mask, grads, lr=0.1
        )
        diff = np.abs(np.asarray(new_table - table)).sum(axis=1)
        np.testing.assert_array_equal(np.flatnonzero(diff), [2, 5])
        mdiff = np.abs(np.asarray(new_state.m)).sum(axis=1)
        np.testing.assert_array_equal(np.flatnonzero(mdiff), [2, 5])
        assert int(new_state.count) == 1

    def test_matches_dense_adam_on_touched_rows(self):
        """First step on a fully-touched table must equal dense Adam."""
        import optax

        rng = np.random.default_rng(0)
        table = jnp.asarray(rng.normal(size=(6, 3)).astype(np.float32))
        grads = jnp.asarray(rng.normal(size=(6, 3)).astype(np.float32))
        rows = jnp.arange(6, dtype=jnp.int32)
        mask = jnp.ones(6, bool)
        sparse_new, _ = sparse_rows_adam_update(
            table, init_sparse_adam_state(table), rows, mask, grads, lr=0.01
        )
        tx = optax.adam(0.01)
        updates, _ = tx.update(grads, tx.init(table))
        dense_new = optax.apply_updates(table, updates)
        np.testing.assert_allclose(
            np.asarray(sparse_new), np.asarray(dense_new), rtol=1e-5, atol=1e-6
        )

    def test_lazy_moments(self):
        """Untouched rows' moments must not decay between steps (torch
        SparseAdam lazy semantics)."""
        table = jnp.ones((4, 2))
        state = init_sparse_adam_state(table)
        r0 = jnp.asarray([0], jnp.int32)
        m1 = jnp.asarray([True])
        g = jnp.ones((1, 2))
        table, state = sparse_rows_adam_update(table, state, r0, m1, g, lr=0.1)
        m_row0 = np.asarray(state.m[0]).copy()
        # second step touches row 3 only; row 0 moments must be unchanged
        table, state = sparse_rows_adam_update(
            table, state, jnp.asarray([3], jnp.int32), m1, g, lr=0.1
        )
        np.testing.assert_array_equal(np.asarray(state.m[0]), m_row0)


class TestSparsePinSAGE:
    def test_trains_and_matches_structure(self):
        g = random_hetero_graph(seed=3, num_users=40, num_items=30, avg_degree=8)
        eu, ei = g.edges[EDGE_KEY]
        tr, va, te = train_test_split_by_time(eu)
        a = LinkPredArtifacts(
            graph=g, train_mask=tr, val_mask=va, test_mask=te,
            customer_id_map_forward={}, article_id_map_forward={},
        )
        data = build_pinsage_data(a)
        cfg = PinSAGEConfig(
            num_epochs=1, batches_per_epoch=20, batch_size=8,
            hidden_dims=16, lr=3e-3, k=5, sparse_embedding=True,
        )
        out = train(cfg, data, log_fn=lambda *_: None)
        assert np.isfinite(out["loss"])
        assert out["item_embeddings"].shape == (30, 16)
