"""PinSAGE: sampler invariants, block chaining, model math, e2e training."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_recommendation_tpu.constants import EDGE_KEY, NODE_ITEM, NODE_USER
from laplace_gnn_recommendation_tpu.data.etl import LinkPredArtifacts
from laplace_gnn_recommendation_tpu.data.pinsage_data import (
    PinSAGESampler,
    build_pinsage_data,
)
from laplace_gnn_recommendation_tpu.data.splitting import train_test_split_by_time
from laplace_gnn_recommendation_tpu.data.synthetic import random_hetero_graph
from laplace_gnn_recommendation_tpu.models import pinsage as M
from laplace_gnn_recommendation_tpu.train.pinsage_pipeline import (
    PinSAGEConfig,
    hits_at_k,
    train,
)


@pytest.fixture(scope="module")
def data():
    g = random_hetero_graph(seed=9, num_users=40, num_items=30, avg_degree=8)
    eu, ei = g.edges[EDGE_KEY]
    tr, va, te = train_test_split_by_time(eu)
    a = LinkPredArtifacts(
        graph=g, train_mask=tr, val_mask=va, test_mask=te,
        customer_id_map_forward={}, article_id_map_forward={},
    )
    return build_pinsage_data(a)


@pytest.fixture(scope="module")
def sampler(data):
    return PinSAGESampler(data, batch_size=8, num_neighbors=3, num_layers=2, seed=1)


class TestSampler:
    def test_item_triples_valid(self, sampler, data):
        heads, tails, negs = sampler.sample_item_triples()
        assert len(heads) == len(tails) == len(negs)
        assert (tails >= 0).all() and (tails < data.num_items).all()

    def test_frontier_topk_and_weights(self, sampler):
        seeds = np.array([0, 1, 2])
        fs, fd, fw = sampler.neighbor_frontier(seeds)
        assert (fw > 0).all()
        for s in seeds:
            assert (fd == s).sum() <= sampler.num_neighbors
        assert not np.any(fs == fd)  # no self edges

    def test_block_chain_alignment(self, sampler):
        """Outer block's dst layout must be the inner block's src layout."""
        blocks, dst = sampler.sample_blocks(np.array([3, 7, 11]))
        assert len(blocks) == 2
        outer, inner = blocks
        np.testing.assert_array_equal(
            np.asarray(outer.dst_ids), np.asarray(inner.src_ids)
        )
        np.testing.assert_array_equal(
            np.asarray(outer.dst_mask), np.asarray(inner.src_mask)
        )
        # innermost dst = seeds at leading slots
        np.testing.assert_array_equal(np.asarray(inner.dst_ids)[:3], [3, 7, 11])
        # every valid edge endpoint is a valid slot
        for b in blocks:
            e = np.asarray(b.edge_w) > 0
            assert np.asarray(b.src_mask)[np.asarray(b.edge_src)[e]].all()
            assert np.asarray(b.dst_mask)[np.asarray(b.edge_dst)[e]].all()

    def test_leak_prevention(self, sampler):
        heads = np.array([0]); tails = np.array([1]); negs = np.array([2])
        forbidden = {(0, 1), (1, 0), (0, 2), (2, 0)}
        blocks, _ = sampler.sample_blocks(
            np.array([0, 1, 2]), forbidden_pairs=forbidden
        )
        inner = blocks[-1]
        e = np.asarray(inner.edge_w) > 0
        sids = np.asarray(inner.src_ids)[np.asarray(inner.edge_src)[e]]
        dids = np.asarray(inner.dst_ids)[np.asarray(inner.edge_dst)[e]]
        for s, d in zip(sids, dids):
            assert (int(s), int(d)) not in forbidden


class TestModel:
    def test_repr_shapes_and_norm(self, sampler, data):
        blocks, _ = sampler.sample_blocks(np.arange(5))
        params = M.init_pinsage_params(
            jax.random.PRNGKey(0), data.num_items,
            data.item_features.max(axis=0).tolist(), 16, 2,
        )
        h = M.get_repr(params, blocks, jnp.asarray(data.item_features), None)
        assert h.shape == (sampler.dst_budget[0], 16)
        assert np.isfinite(np.asarray(h)).all()

    def test_margin_loss_and_grads(self, sampler, data):
        batch = sampler.sample_train_batch()
        params = M.init_pinsage_params(
            jax.random.PRNGKey(0), data.num_items,
            data.item_features.max(axis=0).tolist(), 16, 2,
        )
        loss, grads = jax.value_and_grad(
            lambda p: M.margin_loss(
                p, batch, jnp.asarray(data.item_features), None,
                train=False,
            )
        )(params)
        assert np.isfinite(float(loss))
        assert float(jnp.abs(grads["proj"]["id_table"]).sum()) > 0
        assert float(jnp.abs(grads["bias"]).sum()) > 0

    def test_score_pairs_symmetric_bias(self, data):
        params = M.init_pinsage_params(jax.random.PRNGKey(1), data.num_items, [], 4, 1)
        params["bias"] = jnp.arange(data.num_items, dtype=jnp.float32)
        h = jnp.ones((4, 4))
        dst_ids = jnp.asarray([5, 6, 7, 8])
        s = M.score_pairs(params, h, dst_ids, jnp.asarray([0]), jnp.asarray([1]))
        assert float(s[0]) == pytest.approx(4.0 + 5 + 6)


class TestPipeline:
    def test_train_improves_hits(self, data):
        cfg = PinSAGEConfig(
            num_epochs=2, batches_per_epoch=30, batch_size=8,
            hidden_dims=16, lr=3e-3, k=5, seed=0,
        )
        out = train(cfg, data, log_fn=lambda *_: None)
        assert np.isfinite(out["loss"])
        assert out["item_embeddings"].shape == (data.num_items, 16)
        # hits should at least be a valid probability and usually nonzero on
        # this dense tiny graph
        assert 0.0 <= out["test_hits"] <= 1.0

    def test_checkpoint_resume_legs(self, data, tmp_path):
        """Process-per-leg driver contract: two bounded-epoch calls through
        checkpoint_dir must cover the same epochs as one straight run, with
        the final leg completing (test eval) and the resumed leg folding the
        key rather than replaying epoch 0's stream."""
        cfg = PinSAGEConfig(
            num_epochs=2, batches_per_epoch=20, batch_size=8,
            hidden_dims=16, lr=3e-3, k=5, seed=0,
        )
        d = str(tmp_path / "legs")
        leg1 = train(cfg, data, log_fn=lambda *_: None,
                     checkpoint_dir=d, max_epochs_this_run=1)
        assert leg1["completed"] is False and leg1["epochs_done"] == 1
        assert "test_hits" not in leg1
        leg2 = train(cfg, data, log_fn=lambda *_: None,
                     checkpoint_dir=d, max_epochs_this_run=1)
        assert leg2["completed"] is True and leg2["epochs_done"] == 2
        assert 0.0 <= leg2["test_hits"] <= 1.0
        # resumed params differ from leg1's (epoch 1 actually trained)
        a = np.asarray(jax.tree.leaves(leg1["params"])[0])
        b = np.asarray(jax.tree.leaves(leg2["params"])[0])
        assert not np.allclose(a, b)

    def test_hits_oracle(self, data):
        """With identity-like embeddings, hits happen iff a user's val item
        is similar to their latest item — check against a direct computation."""
        rng = np.random.default_rng(0)
        h = rng.normal(size=(data.num_items, 8)).astype(np.float32)
        got = hits_at_k(data, h, 5, "val")
        users = [u for u in range(data.num_users) if len(data.val_items[u])]
        want = []
        for u in users:
            latest = data.latest_item_per_user[u]
            scores = h[latest] @ h.T
            scores[data.user_csr.neighbors(u)] = -np.inf
            topk = np.argsort(-scores)[:5]
            want.append(bool(np.isin(topk, data.val_items[u]).any()))
        assert got == pytest.approx(np.mean(want))
