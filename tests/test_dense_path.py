"""Dense MXU propagation path: numerical parity with the segment-sum path."""
import jax
import numpy as np
import pytest

from laplace_gnn_recommendation_tpu.configs import LightGCNConfig
from laplace_gnn_recommendation_tpu.data.graph import BipartiteGraph
from laplace_gnn_recommendation_tpu.data.lightgcn_data import create_lightgcn_data
from laplace_gnn_recommendation_tpu.data.synthetic import random_bipartite_edges
from laplace_gnn_recommendation_tpu.models.lightgcn import (
    init_lightgcn,
    lightgcn_forward,
)
from laplace_gnn_recommendation_tpu.ops.spmm_dense import (
    DenseAdjacency,
    dense_fits,
)
from laplace_gnn_recommendation_tpu.train import lightgcn_pipeline


@pytest.fixture(scope="module")
def graph():
    eu, ei = random_bipartite_edges(seed=5, num_users=90, num_items=70, avg_degree=7)
    return BipartiteGraph.from_edges(eu, ei, 90, 70, pad_multiple=64)


class TestDensePath:
    def test_dense_fits_budget(self):
        assert dense_fits(6040, 3706)                  # ML-1M: 90 MB
        assert not dense_fits(1_371_980, 104_547)      # H&M: 574 GB

    def test_forward_parity(self, graph):
        params = init_lightgcn(jax.random.PRNGKey(0), 90, 70, 16)
        d = DenseAdjacency.from_graph(graph)
        uf_s, _, if_s, _ = lightgcn_forward(params, graph, 3)
        uf_d, _, if_d, _ = lightgcn_forward(params, d, 3)
        # bf16 adjacency entries → ~1e-2 relative agreement
        np.testing.assert_allclose(
            np.asarray(uf_s), np.asarray(uf_d), rtol=2e-2, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(if_s), np.asarray(if_d), rtol=2e-2, atol=2e-3
        )

    def test_train_step_parity(self, graph):
        cfg = LightGCNConfig(
            hidden_layer_size=8, num_iterations=2, batch_size=32, k=12
        )
        max_deg = int(np.asarray(graph.user_deg).max())
        p1 = init_lightgcn(jax.random.PRNGKey(1), 90, 70, 8)
        p2 = init_lightgcn(jax.random.PRNGKey(1), 90, 70, 8)
        s_sparse, tx1 = lightgcn_pipeline.make_train_step(cfg, graph, max_deg)
        s_dense, tx2 = lightgcn_pipeline.make_train_step(
            cfg, graph, max_deg, prop_graph=DenseAdjacency.from_graph(graph)
        )
        key = jax.random.PRNGKey(2)
        _, _, l1 = s_sparse(p1, tx1.init(p1), key)
        _, _, l2 = s_dense(p2, tx2.init(p2), key)
        assert abs(float(l1) - float(l2)) < 1e-3

    def test_pipeline_uses_dense_and_trains(self):
        eu, ei = random_bipartite_edges(
            seed=12, num_users=120, num_items=80, avg_degree=12
        )
        data = create_lightgcn_data(eu, ei, 120, 80, pad_multiple=64)
        cfg = LightGCNConfig(
            epochs=60, hidden_layer_size=16, batch_size=256, num_iterations=2,
            eval_every=30, learning_rate=1e-2, k=12, seed=42,
        )
        assert isinstance(
            lightgcn_pipeline.maybe_dense(cfg, data.train_graph), DenseAdjacency
        )
        stats = lightgcn_pipeline.train(
            cfg, data, export=False, log_fn=lambda *_: None
        )
        assert stats.loss < 0.69  # below ln 2 start

    def test_budget_zero_falls_back_to_blocked(self, graph):
        from laplace_gnn_recommendation_tpu.ops.spmm_blocked import BlockedGraph

        cfg = LightGCNConfig(dense_bytes_budget=0)
        assert isinstance(
            lightgcn_pipeline.maybe_dense(cfg, graph), BlockedGraph
        )
