"""Sharded SpMM (shard_map) vs the single-device segment-sum path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_recommendation_tpu.data.graph import BipartiteGraph
from laplace_gnn_recommendation_tpu.data.synthetic import random_bipartite_edges
from laplace_gnn_recommendation_tpu.ops.spmm import lightgcn_propagate, propagate_bipartite
from laplace_gnn_recommendation_tpu.ops.spmm_sharded import (
    ShardedBipartiteGraph,
    lightgcn_propagate_sharded,
    propagate_sharded,
)
from laplace_gnn_recommendation_tpu.parallel.mesh import row_sharding


@pytest.fixture(scope="module")
def setup(mesh8):
    # node counts divisible by the model axis (4)
    eu, ei = random_bipartite_edges(seed=8, num_users=96, num_items=64, avg_degree=6)
    g = BipartiteGraph.from_edges(eu, ei, 96, 64, pad_multiple=32)
    sg = ShardedBipartiteGraph.from_graph(g, mesh8)
    rng = np.random.default_rng(0)
    ue = jnp.asarray(rng.normal(size=(96, 16)).astype(np.float32))
    ie = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    return g, sg, ue, ie


class TestShardedSpMM:
    def test_single_step_parity(self, mesh8, setup):
        g, sg, ue, ie = setup
        want_u, want_i = propagate_bipartite(g, ue, ie)
        got_u, got_i = propagate_sharded(
            mesh8,
            sg,
            jax.device_put(ue, row_sharding(mesh8)),
            jax.device_put(ie, row_sharding(mesh8)),
        )
        np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i), rtol=1e-5, atol=1e-6)

    def test_k_hop_parity(self, mesh8, setup):
        g, sg, ue, ie = setup
        want_u, want_i = lightgcn_propagate(g, ue, ie, 3)
        got_u, got_i = lightgcn_propagate_sharded(
            mesh8, sg,
            jax.device_put(ue, row_sharding(mesh8)),
            jax.device_put(ie, row_sharding(mesh8)),
            3,
        )
        np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i), rtol=1e-4, atol=1e-5)

    def test_output_stays_sharded(self, mesh8, setup):
        g, sg, ue, ie = setup
        got_u, _ = propagate_sharded(
            mesh8, sg,
            jax.device_put(ue, row_sharding(mesh8)),
            jax.device_put(ie, row_sharding(mesh8)),
        )
        spec = got_u.sharding.spec
        assert spec[0] == "model"

    def test_gradient_parity(self, mesh8, setup):
        """Backward through the sharded propagation must match the local path."""
        g, sg, ue, ie = setup

        def loss_local(u, i):
            nu, ni = propagate_bipartite(g, u, i)
            return jnp.sum(nu ** 2) + jnp.sum(ni ** 2)

        def loss_sharded(u, i):
            nu, ni = propagate_sharded(mesh8, sg, u, i)
            return jnp.sum(nu ** 2) + jnp.sum(ni ** 2)

        g1 = jax.grad(loss_local, argnums=(0, 1))(ue, ie)
        g2 = jax.grad(loss_sharded, argnums=(0, 1))(
            jax.device_put(ue, row_sharding(mesh8)),
            jax.device_put(ie, row_sharding(mesh8)),
        )
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
