"""Extra node type (colour group) in the hetero SAGE encoder.

Exercises the multi-relation to_hetero semantics the two-type default never
reaches: items aggregate TWO incoming edge types (``rev_buys`` from users +
``rev_has_color`` from colour groups) via ``heterogeneous_prop_agg_type``
(reference ``utils/constants.py:12-21``, ``run_preprocessing_fashion.py:
86-112``, ``temporary_hetero.py:171-228``).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_recommendation_tpu.configs import Config
from laplace_gnn_recommendation_tpu.constants import (
    NODE_EXTRA,
    NODE_ITEM,
    NODE_USER,
)
from laplace_gnn_recommendation_tpu.data.link_pred_data import (
    create_link_pred_data,
    create_samplers,
)
from laplace_gnn_recommendation_tpu.data.synthetic import random_hetero_graph
from laplace_gnn_recommendation_tpu.models import sage
from laplace_gnn_recommendation_tpu.train import encdec_pipeline

NUM_EXTRA = 5


def make_cfg(**kw):
    defaults = dict(
        epochs=2, batch_size=8, num_neighbors=16, n_hop_neighbors=2,
        hidden_layer_size=32, encoder_layer_output_size=16,
        num_gnn_layers=2, num_linear_layers=2, learning_rate=0.01,
        k=6, candidate_pool_size=10, positive_edges_ratio=0.5,
        negative_edges_ratio=2.0, eval_every=1, save_model=False,
        p_dropout_features=0.0, batch_norm=True, seed=5,
        heterogeneous_prop_agg_type="sum",
    )
    defaults.update(kw)
    return Config(**defaults)


@pytest.fixture(scope="module")
def setup():
    g = random_hetero_graph(
        seed=4, num_users=60, num_items=50, avg_degree=6, num_extra=NUM_EXTRA
    )
    cfg = make_cfg()
    data = create_link_pred_data(g, cfg)
    return g, cfg, data


class TestExtraData:
    def test_link_pred_data_carries_extra(self, setup):
        g, cfg, data = setup
        assert data.num_extra == NUM_EXTRA
        assert data.item_extra_ids.shape == (50,)
        assert data.extra_features.shape == (NUM_EXTRA, 1)
        # every item's colour id is in range
        ids = np.asarray(data.item_extra_ids)
        assert ids.min() >= 0 and ids.max() < NUM_EXTRA

    def test_feature_info_includes_extra(self, setup):
        g, cfg, data = setup
        info = sage.get_feature_info(g)
        assert NODE_EXTRA in info
        assert info[NODE_EXTRA].num_feat == 1


class TestExtraModel:
    def _init(self, cfg, data, seed=0):
        feature_info = sage.get_feature_info(data.graph)
        return sage.init_sage_params(
            jax.random.PRNGKey(seed), cfg, feature_info,
            num_extra=data.num_extra,
        )

    def test_params_have_extra_convs(self, setup):
        g, cfg, data = setup
        params, _ = self._init(cfg, data)
        for layer in params["convs"]:
            assert {"item_to_user", "user_to_item",
                    "extra_to_item", "item_to_extra"} == set(layer)
        assert NODE_EXTRA in params["embeddings"]

    def test_forward_runs_and_changes_with_colours(self, setup):
        """Reassigning every item to a different colour must change the
        logits — the extra path is live."""
        g, cfg, data = setup
        params, bn_state = self._init(cfg, data)
        train_s, _, _ = create_samplers(cfg, data, randomization=False)
        batch = next(iter(train_s.epoch_batches(shuffle=False)))
        logits1, _ = sage.forward(
            params, bn_state, batch, data.user_features, data.item_features,
            cfg, item_extra_ids=data.item_extra_ids,
            extra_features=data.extra_features,
        )
        shifted = (data.item_extra_ids + 1) % NUM_EXTRA
        logits2, _ = sage.forward(
            params, bn_state, batch, data.user_features, data.item_features,
            cfg, item_extra_ids=shifted,
            extra_features=data.extra_features,
        )
        assert not np.allclose(np.asarray(logits1), np.asarray(logits2))

    def test_zeroed_extra_convs_reduce_to_two_type_model(self, setup):
        """With sum combine-aggregation and the extra_to_item conv zeroed,
        the three-type forward must equal the two-type forward on identical
        user/item weights — the multi-relation combine is exactly additive
        (to_hetero 'sum' semantics)."""
        g, cfg, data = setup
        params, bn_state = self._init(cfg, data)
        zeroed = jax.tree.map(lambda x: x, params)  # shallow-ish copy
        for li in range(len(params["convs"])):
            zeroed["convs"][li] = dict(params["convs"][li])
            zeroed["convs"][li]["extra_to_item"] = jax.tree.map(
                jnp.zeros_like, params["convs"][li]["extra_to_item"]
            )
        train_s, _, _ = create_samplers(cfg, data, randomization=False)
        batch = next(iter(train_s.epoch_batches(shuffle=False)))
        with_extra, _ = sage.forward(
            zeroed, bn_state, batch, data.user_features, data.item_features,
            cfg, item_extra_ids=data.item_extra_ids,
            extra_features=data.extra_features,
        )
        without, _ = sage.forward(
            zeroed, bn_state, batch, data.user_features, data.item_features,
            cfg, item_extra_ids=None,
        )
        np.testing.assert_allclose(
            np.asarray(with_extra), np.asarray(without), rtol=1e-5, atol=1e-6
        )

    def test_mean_combine_differs_from_sum(self, setup):
        g, cfg, data = setup
        params, bn_state = self._init(cfg, data)
        train_s, _, _ = create_samplers(cfg, data, randomization=False)
        batch = next(iter(train_s.epoch_batches(shuffle=False)))
        cfg_mean = dataclasses.replace(
            cfg, heterogeneous_prop_agg_type="mean"
        )
        l_sum, _ = sage.forward(
            params, bn_state, batch, data.user_features, data.item_features,
            cfg, item_extra_ids=data.item_extra_ids,
            extra_features=data.extra_features,
        )
        l_mean, _ = sage.forward(
            params, bn_state, batch, data.user_features, data.item_features,
            cfg_mean, item_extra_ids=data.item_extra_ids,
            extra_features=data.extra_features,
        )
        assert not np.allclose(np.asarray(l_sum), np.asarray(l_mean))

    def test_gradients_flow_to_extra_params(self, setup):
        g, cfg, data = setup
        params, bn_state = self._init(cfg, data)
        train_s, _, _ = create_samplers(cfg, data, randomization=False)
        batch = next(iter(train_s.epoch_batches(shuffle=False)))

        def loss_fn(p):
            logits, _ = sage.forward(
                p, bn_state, batch, data.user_features, data.item_features,
                cfg, train=True, rng=jax.random.PRNGKey(0),
                item_extra_ids=data.item_extra_ids,
                extra_features=data.extra_features,
            )
            return sage.bce_loss(logits, batch)

        grads = jax.grad(loss_fn)(params)
        g_emb = np.asarray(grads["embeddings"][NODE_EXTRA][0])
        g_conv = np.asarray(grads["convs"][0]["extra_to_item"]["lin_l"]["w"])
        assert np.abs(g_emb).max() > 0
        assert np.abs(g_conv).max() > 0


class TestExtraPipeline:
    def test_end_to_end_with_extra(self, setup, tmp_path):
        g, cfg, data = setup
        cfg = make_cfg(epochs=3)
        stats = encdec_pipeline.run_pipeline(
            cfg, data, model_dir=str(tmp_path), randomization=True
        )
        assert np.isfinite(stats.loss)
        assert stats.loss < 0.75   # moves off the ln(2)≈0.693 start


class TestItemsWithoutColorEdge:
    """Items with NO has_color edge (possible on real H&M slices where the
    colour column is missing for some articles) must receive and send no
    extra-type messages — not be silently conflated with colour group 0."""

    def _data_missing(self, drop=(0, 7, 13)):
        g = random_hetero_graph(
            seed=9, num_users=40, num_items=30, avg_degree=5,
            num_extra=NUM_EXTRA,
        )
        from laplace_gnn_recommendation_tpu.constants import EDGE_KEY_EXTRA
        from laplace_gnn_recommendation_tpu.data.graph import HeteroGraph

        src, dst = g.edges[EDGE_KEY_EXTRA]
        keep = ~np.isin(src, np.asarray(drop))
        edges = dict(g.edges)
        edges[EDGE_KEY_EXTRA] = (src[keep], dst[keep])
        g2 = HeteroGraph(
            node_features=g.node_features, edges=edges,
            num_nodes=g.num_nodes,
        )
        cfg = make_cfg(num_gnn_layers=1, batch_size=6)
        return g2, cfg, create_link_pred_data(g2, cfg)

    def test_extract_marks_uncovered_items(self):
        _, _, data = self._data_missing()
        ids = np.asarray(data.item_extra_ids)
        assert (ids[[0, 7, 13]] == -1).all()
        covered = np.setdiff1d(np.arange(30), [0, 7, 13])
        assert (ids[covered] >= 0).all() and (ids[covered] < NUM_EXTRA).all()

    def test_uncovered_item_embedding_invariant_to_colours(self):
        """With ONE GNN layer, an edge-less item's encoding cannot depend on
        the colour-group embedding table; a covered item's must."""
        g2, cfg, data = self._data_missing()
        info = sage.get_feature_info(g2)
        params, bn_state = sage.init_sage_params(
            jax.random.PRNGKey(0), cfg, info, num_extra=data.num_extra
        )
        train_s, _, _ = create_samplers(cfg, data, randomization=False)
        batch = next(iter(train_s.epoch_batches(shuffle=False)))

        perturbed = jax.tree.map(lambda x: x, params)
        perturbed["embeddings"] = dict(params["embeddings"])
        perturbed["embeddings"][NODE_EXTRA] = [
            t + 1.0 for t in params["embeddings"][NODE_EXTRA]
        ]
        kw = dict(
            item_extra_ids=data.item_extra_ids,
            extra_features=data.extra_features,
        )
        _, z1, _ = sage.encode(
            params, bn_state, batch, data.user_features,
            data.item_features, cfg, **kw,
        )
        _, z2, _ = sage.encode(
            perturbed, bn_state, batch, data.user_features,
            data.item_features, cfg, **kw,
        )
        z1, z2 = np.asarray(z1), np.asarray(z2)
        item_ids = np.asarray(batch.item_ids)
        mask = np.asarray(batch.item_mask)
        uncovered = mask & np.isin(item_ids, [0, 7, 13])
        covered = mask & ~np.isin(item_ids, [0, 7, 13])
        assert uncovered.any() and covered.any()
        np.testing.assert_allclose(z1[uncovered], z2[uncovered], atol=1e-6)
        assert np.abs(z1[covered] - z2[covered]).max() > 1e-4
