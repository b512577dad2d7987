"""Blocked one-hot-matmul segment sum vs the plain segment-sum path."""
import jax
import numpy as np
import pytest
import jax.numpy as jnp

from laplace_gnn_recommendation_tpu.configs import LightGCNConfig
from laplace_gnn_recommendation_tpu.data.graph import BipartiteGraph
from laplace_gnn_recommendation_tpu.data.synthetic import random_bipartite_edges
from laplace_gnn_recommendation_tpu.models.lightgcn import init_lightgcn, lightgcn_forward
from laplace_gnn_recommendation_tpu.ops.spmm import lightgcn_propagate, propagate_bipartite
from laplace_gnn_recommendation_tpu.ops.spmm_blocked import (
    BlockedGraph,
    BlockedSegmentPlan,
    lightgcn_propagate_blocked,
    propagate_blocked,
)
from laplace_gnn_recommendation_tpu.train.lightgcn_pipeline import maybe_dense


@pytest.fixture(scope="module")
def setup():
    eu, ei = random_bipartite_edges(seed=7, num_users=70, num_items=50, avg_degree=9)
    g = BipartiteGraph.from_edges(eu, ei, 70, 50, pad_multiple=32)
    bg = BlockedGraph.from_graph(g, edges_per_chunk=16, rows_per_chunk=4)
    rng = np.random.default_rng(0)
    xu = jnp.asarray(rng.normal(size=(70, 8)).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=(50, 8)).astype(np.float32))
    return g, bg, eu, ei, xu, xi


class TestBlockedSegmentSum:
    def test_single_step_parity(self, setup):
        g, bg, eu, ei, xu, xi = setup
        wu, wi = propagate_bipartite(g, xu, xi)
        gu, gi = propagate_blocked(bg, xu, xi)
        np.testing.assert_allclose(np.asarray(gu), np.asarray(wu), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gi), np.asarray(wi), rtol=1e-5, atol=1e-6)

    def test_k_hop_parity(self, setup):
        g, bg, eu, ei, xu, xi = setup
        wu, wi = lightgcn_propagate(g, xu, xi, 3)
        gu, gi = lightgcn_propagate_blocked(bg, xu, xi, 3)
        np.testing.assert_allclose(np.asarray(gu), np.asarray(wu), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gi), np.asarray(wi), rtol=1e-4, atol=1e-5)

    def test_host_edges_constructor_matches(self, setup):
        g, bg, eu, ei, xu, xi = setup
        bg2 = BlockedGraph.from_host_edges(eu, ei, 70, 50, 16, 4)
        gu, _ = propagate_blocked(bg, xu, xi)
        gu2, _ = propagate_blocked(bg2, xu, xi)
        np.testing.assert_allclose(np.asarray(gu), np.asarray(gu2), rtol=1e-6)

    def test_row_budget_respected(self, setup):
        g, bg, *_ = setup
        for plan in (bg.to_user, bg.to_item):
            local = np.asarray(plan.local_row)
            assert local.max() < plan.rows_per_chunk
            # row_ids pads are OOB sentinels
            rows = np.asarray(plan.row_ids)
            assert ((rows <= plan.num_rows)).all()

    def test_gradient_parity(self, setup):
        g, bg, eu, ei, xu, xi = setup

        def loss_plain(u, i):
            a, b = propagate_bipartite(g, u, i)
            return jnp.sum(a ** 2) + jnp.sum(b ** 2)

        def loss_blocked(u, i):
            a, b = propagate_blocked(bg, u, i)
            return jnp.sum(a ** 2) + jnp.sum(b ** 2)

        g1 = jax.grad(loss_plain, (0, 1))(xu, xi)
        g2 = jax.grad(loss_blocked, (0, 1))(xu, xi)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    def test_forward_dispatch_and_fallback(self, setup):
        g, bg, *_ = setup
        params = init_lightgcn(jax.random.PRNGKey(0), 70, 50, 8)
        uf1, _, if1, _ = lightgcn_forward(params, g, 2)
        uf2, _, if2, _ = lightgcn_forward(params, bg, 2)
        np.testing.assert_allclose(np.asarray(uf1), np.asarray(uf2), rtol=1e-4, atol=1e-5)
        # budget 0 → blocked layout (not raw BipartiteGraph)
        cfg = LightGCNConfig(dense_bytes_budget=0)
        assert isinstance(maybe_dense(cfg, g), BlockedGraph)


class TestGatherBF16:
    def test_bf16_gather_close_to_f32(self):
        import dataclasses

        import jax.numpy as jnp
        import numpy as np

        from laplace_gnn_recommendation_tpu.data.graph import BipartiteGraph
        from laplace_gnn_recommendation_tpu.data.synthetic import (
            random_bipartite_edges,
        )
        from laplace_gnn_recommendation_tpu.ops.spmm import propagate_bipartite
        from laplace_gnn_recommendation_tpu.ops.spmm_blocked import (
            BlockedGraph,
            propagate_blocked,
        )

        eu, ei = random_bipartite_edges(
            seed=2, num_users=300, num_items=200, avg_degree=8
        )
        g = BipartiteGraph.from_edges(eu, ei, 300, 200)
        bg16 = dataclasses.replace(BlockedGraph.from_graph(g), gather_bf16=True)
        rng = np.random.default_rng(0)
        xu = jnp.asarray(rng.normal(size=(300, 16)).astype(np.float32))
        xi = jnp.asarray(rng.normal(size=(200, 16)).astype(np.float32))
        ru, ri = propagate_bipartite(g, xu, xi)
        bu, bi = propagate_blocked(bg16, xu, xi)
        np.testing.assert_allclose(np.asarray(bu), np.asarray(ru), rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(bi), np.asarray(ri), rtol=2e-2, atol=2e-2)

    def test_select_propagation_sets_flag_for_big_graphs(self):
        from laplace_gnn_recommendation_tpu.configs import LightGCNConfig
        from laplace_gnn_recommendation_tpu.data.graph import BipartiteGraph
        from laplace_gnn_recommendation_tpu.data.synthetic import (
            random_bipartite_edges,
        )
        from laplace_gnn_recommendation_tpu.ops.spmm_blocked import BlockedGraph
        from laplace_gnn_recommendation_tpu.train.lightgcn_pipeline import (
            select_propagation,
        )

        eu, ei = random_bipartite_edges(
            seed=0, num_users=1000, num_items=100, avg_degree=3
        )
        # node-count METADATA drives the flag; edges stay tiny
        g = BipartiteGraph.from_edges(eu, ei, 1 << 19, 100)
        cfg = LightGCNConfig(propagation="blocked")
        op = select_propagation(cfg, g)
        assert isinstance(op, BlockedGraph) and op.gather_bf16
        g2 = BipartiteGraph.from_edges(eu, ei, 1000, 100)
        assert not select_propagation(cfg, g2).gather_bf16
