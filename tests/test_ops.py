"""Unit tests for the core ops against independent numpy oracles.

Modeled on the reference's oracle strategy (``tests/test_dataset.py:25-93``):
every kernel is checked against a second, naive implementation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_recommendation_tpu.data.graph import BipartiteGraph, HostCSR
from laplace_gnn_recommendation_tpu.data.synthetic import random_bipartite_edges
from laplace_gnn_recommendation_tpu.ops.search import batched_membership, lower_bound
from laplace_gnn_recommendation_tpu.ops.sampling import (
    sample_bpr_batch,
    structured_negative_sampling,
)
from laplace_gnn_recommendation_tpu.ops.spmm import (
    lightgcn_propagate,
    propagate_bipartite,
    segment_max,
    segment_mean,
)


def dense_adj(eu, ei, nu, ni):
    a = np.zeros((nu, ni))
    a[eu, ei] = 1.0
    return a


def gcn_norm_dense(a):
    du = a.sum(1)
    di = a.sum(0)
    with np.errstate(divide="ignore"):
        su = np.where(du > 0, 1 / np.sqrt(du), 0.0)
        si = np.where(di > 0, 1 / np.sqrt(di), 0.0)
    return su[:, None] * a * si[None, :]


@pytest.fixture(scope="module")
def small_graph():
    eu, ei = random_bipartite_edges(seed=3, num_users=40, num_items=60, avg_degree=5)
    g = BipartiteGraph.from_edges(eu, ei, 40, 60, pad_multiple=32)
    return g, eu, ei


class TestPropagation:
    def test_gcn_norm_weights(self, small_graph):
        g, eu, ei = small_graph
        a_norm = gcn_norm_dense(dense_adj(eu, ei, 40, 60))
        w = np.asarray(g.edge_w[: g.num_edges])
        u = np.asarray(g.edge_user[: g.num_edges])
        i = np.asarray(g.edge_item[: g.num_edges])
        np.testing.assert_allclose(w, a_norm[u, i], rtol=1e-6)

    def test_propagate_matches_dense(self, small_graph):
        g, eu, ei = small_graph
        rng = np.random.default_rng(0)
        xu = rng.normal(size=(40, 8)).astype(np.float32)
        xi = rng.normal(size=(60, 8)).astype(np.float32)
        a_norm = gcn_norm_dense(dense_adj(eu, ei, 40, 60))
        nu, ni = propagate_bipartite(g, jnp.asarray(xu), jnp.asarray(xi))
        np.testing.assert_allclose(np.asarray(nu), a_norm @ xi, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ni), a_norm.T @ xu, rtol=2e-4, atol=1e-5)

    def test_lightgcn_multiscale_mean(self, small_graph):
        """E_final must equal mean(E0..EK) of the dense diffusion."""
        g, eu, ei = small_graph
        rng = np.random.default_rng(1)
        xu = rng.normal(size=(40, 4)).astype(np.float32)
        xi = rng.normal(size=(60, 4)).astype(np.float32)
        a = gcn_norm_dense(dense_adj(eu, ei, 40, 60))
        us, its = [xu], [xi]
        for _ in range(3):
            us.append(a @ its[-1])
            its.append(a.T @ us[-2])
        fu, fi = lightgcn_propagate(g, jnp.asarray(xu), jnp.asarray(xi), 3)
        np.testing.assert_allclose(np.asarray(fu), np.mean(us, axis=0), rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(fi), np.mean(its, axis=0), rtol=2e-4, atol=1e-5)

    def test_segment_mean_max(self):
        data = jnp.asarray(np.arange(12, dtype=np.float32).reshape(6, 2))
        seg = jnp.asarray([0, 0, 1, 1, 1, 3])
        m = np.asarray(segment_mean(data, seg, 5))
        np.testing.assert_allclose(m[0], [1, 2])
        np.testing.assert_allclose(m[1], [6, 7])
        np.testing.assert_allclose(m[2], [0, 0])
        mx = np.asarray(segment_max(data, seg, 5))
        np.testing.assert_allclose(mx[1], [8, 9])
        np.testing.assert_allclose(mx[4], [0, 0])  # empty → 0, not -inf


class TestSearch:
    def test_lower_bound_matches_numpy(self):
        rng = np.random.default_rng(0)
        vals = np.sort(rng.integers(0, 100, 64))
        targets = rng.integers(-5, 110, 33)
        lo = jnp.zeros(33, jnp.int32)
        hi = jnp.full(33, 64, jnp.int32)
        got = np.asarray(lower_bound(jnp.asarray(vals), lo, hi, jnp.asarray(targets), 64))
        want = np.searchsorted(vals, targets, side="left")
        np.testing.assert_array_equal(got, want)

    def test_membership(self, small_graph):
        g, eu, ei = small_graph
        row_ptr = jnp.asarray(
            np.concatenate([[0], np.cumsum(np.asarray(g.user_deg))]).astype(np.int32)
        )
        pos = {(int(u), int(i)) for u, i in zip(eu, ei)}
        rng = np.random.default_rng(7)
        qu = rng.integers(0, 40, 200).astype(np.int32)
        qi = rng.integers(0, 60, 200).astype(np.int32)
        got = np.asarray(
            batched_membership(
                row_ptr, g.edge_item, jnp.asarray(qu), jnp.asarray(qi),
                max_row_len=int(np.asarray(g.user_deg).max()),
            )
        )
        want = np.array([(int(u), int(i)) in pos for u, i in zip(qu, qi)])
        np.testing.assert_array_equal(got, want)


class TestNegativeSampling:
    def test_no_positive_sampled(self, small_graph):
        g, eu, ei = small_graph
        row_ptr = jnp.asarray(
            np.concatenate([[0], np.cumsum(np.asarray(g.user_deg))]).astype(np.int32)
        )
        max_deg = int(np.asarray(g.user_deg).max())
        key = jax.random.PRNGKey(0)
        users = jnp.asarray(eu[:128].astype(np.int32))
        neg = np.asarray(
            structured_negative_sampling(
                key, users, row_ptr, g.edge_item, 60, max_deg
            )
        )
        assert neg.min() >= 0 and neg.max() < 60
        pos = {(int(u), int(i)) for u, i in zip(eu, ei)}
        collisions = sum((int(u), int(n)) in pos for u, n in zip(eu[:128], neg))
        assert collisions == 0

    def test_bpr_batch_shapes_and_validity(self, small_graph):
        g, eu, ei = small_graph
        row_ptr = jnp.asarray(
            np.concatenate([[0], np.cumsum(np.asarray(g.user_deg))]).astype(np.int32)
        )
        max_deg = int(np.asarray(g.user_deg).max())
        u, pos, neg = sample_bpr_batch(
            jax.random.PRNGKey(1), g.edge_user, g.edge_item, g.num_edges,
            64, row_ptr, g.edge_item, 60, max_deg,
        )
        posset = {(int(a), int(b)) for a, b in zip(eu, ei)}
        for a, b in zip(np.asarray(u), np.asarray(pos)):
            assert (int(a), int(b)) in posset  # sampled pairs are real edges


class TestHostCSR:
    def test_neighbors(self):
        eu = np.array([0, 0, 2, 1])
        ei = np.array([5, 3, 1, 0])
        csr = HostCSR.from_edges(eu, ei, 3, 6)
        np.testing.assert_array_equal(csr.neighbors(0), [3, 5])
        np.testing.assert_array_equal(csr.neighbors(1), [0])
        np.testing.assert_array_equal(csr.neighbors(2), [1])
        np.testing.assert_array_equal(csr.degrees, [2, 1, 1])
