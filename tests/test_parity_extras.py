"""Coverage for parity behaviors not exercised elsewhere: legacy BPR
variant, final-embedding eval, same-location matcher, unexcluded sharded
top-k, MAP@k in a ranking flow."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_recommendation_tpu.configs import LightGCNConfig
from laplace_gnn_recommendation_tpu.data.graph import HostCSR
from laplace_gnn_recommendation_tpu.data.lightgcn_data import create_lightgcn_data
from laplace_gnn_recommendation_tpu.data.matchers import UsersSameLocationMatcher
from laplace_gnn_recommendation_tpu.data.synthetic import random_bipartite_edges
from laplace_gnn_recommendation_tpu.ops.metrics import map_at_k, topk_hits
from laplace_gnn_recommendation_tpu.ops.topk import mips_topk, sharded_mips_topk
from laplace_gnn_recommendation_tpu.train import lightgcn_pipeline


@pytest.fixture(scope="module")
def tiny_data():
    eu, ei = random_bipartite_edges(seed=21, num_users=80, num_items=60, avg_degree=10)
    return create_lightgcn_data(eu, ei, 80, 60, pad_multiple=64)


class TestLegacyBPR:
    def test_legacy_loss_goes_negative(self, tiny_data):
        """The reference's sign-quirk loss decreases below zero (its own
        acceptance floor is loss < -0.8, tests/test_acceptance_lightgcn.py:53)."""
        cfg = LightGCNConfig(
            epochs=120, hidden_layer_size=16, batch_size=256, num_iterations=2,
            eval_every=1000, learning_rate=1e-2, k=12, seed=0,
            bpr_variant="legacy",
        )
        stats = lightgcn_pipeline.train(
            cfg, tiny_data, export=False, log_fn=lambda *_: None
        )
        assert stats.loss < -0.8


class TestFinalEmbeddingEval:
    def test_final_differs_from_e0_and_is_valid(self, tiny_data):
        from laplace_gnn_recommendation_tpu.models.lightgcn import init_lightgcn

        cfg = LightGCNConfig(hidden_layer_size=8, num_iterations=2, k=12)
        params = init_lightgcn(jax.random.PRNGKey(0), 80, 60, 8)
        r0 = lightgcn_pipeline.get_metrics(
            params, cfg, tiny_data.val_set,
            graph_for_final=tiny_data.val_graph, eval_embeddings="e0",
        )
        rf = lightgcn_pipeline.get_metrics(
            params, cfg, tiny_data.val_set,
            graph_for_final=tiny_data.val_graph, eval_embeddings="final",
        )
        for v in (*r0, *rf):
            assert 0.0 <= v <= 1.0
        assert r0 != rf  # diffusion must change the ranking


class TestSameLocationMatcher:
    def test_matches_are_peer_items(self):
        eu = np.array([0, 0, 1, 2, 2, 3])
        ei = np.array([5, 6, 7, 8, 9, 1])
        csr = HostCSR.from_edges(eu, ei, 4, 10)
        loc = np.array([0, 0, 1, 1])
        per_loc = {0: [0, 1], 1: [2, 3]}
        m = UsersSameLocationMatcher(10, loc, per_loc, csr)
        # user 0's peers are users 0,1 → items {5,6,7}
        np.testing.assert_array_equal(sorted(m.get_matches(0)), [5, 6, 7])
        # user 3's peers are users 2,3 → items {8,9,1}
        np.testing.assert_array_equal(sorted(m.get_matches(3)), [1, 8, 9])

    def test_empty_location(self):
        csr = HostCSR.from_edges(np.array([0]), np.array([1]), 2, 3)
        m = UsersSameLocationMatcher(5, np.array([0, 7]), {0: [0]}, csr)
        assert len(m.get_matches(1)) == 0  # location 7 unknown


class TestShardedTopKNoExclusion:
    def test_matches_single_device(self, mesh8):
        rng = np.random.default_rng(9)
        u = jnp.asarray(rng.normal(size=(5, 16)).astype(np.float32))
        it = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
        v1, i1 = mips_topk(u, it, 6)
        v2, i2 = sharded_mips_topk(mesh8, u, it, 6)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


class TestMapAtK:
    def test_full_ranking_flow(self):
        """MAP@12 over a ranked candidate list with known hit pattern."""
        topk = jnp.asarray([[3, 7, 1, 9]])
        gt = jnp.asarray([[7, 9, -1]])
        cnt = jnp.asarray([2])
        r = topk_hits(topk, gt, cnt)
        # hits at ranks 2 and 4: AP = (1/2 + 2/4) / 2 = 0.5
        assert float(map_at_k(r, cnt, 4)) == pytest.approx(0.5)
