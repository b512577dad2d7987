"""Non-categorical (float) node features through the hetero encoder —
the CLIP-embedding path of H&M preprocessing (reference
``run_preprocessing_fashion.py:129-162,201-204``)."""
import jax
import numpy as np
import pytest

from laplace_gnn_recommendation_tpu.configs import Config
from laplace_gnn_recommendation_tpu.constants import EDGE_KEY, NODE_ITEM, NODE_USER
from laplace_gnn_recommendation_tpu.data.link_pred_data import (
    create_link_pred_data,
    create_samplers,
)
from laplace_gnn_recommendation_tpu.data.synthetic import random_hetero_graph
from laplace_gnn_recommendation_tpu.models import sage
from laplace_gnn_recommendation_tpu.train import encdec_pipeline


@pytest.fixture(scope="module")
def setup():
    g = random_hetero_graph(seed=5, num_users=40, num_items=30, avg_degree=5)
    rng = np.random.default_rng(0)
    # 16-d float item features standing in for CLIP embeddings
    g.node_features_float[NODE_ITEM] = rng.normal(size=(30, 16)).astype(np.float32)
    cfg = Config(
        epochs=2, batch_size=6, num_neighbors=8, n_hop_neighbors=2,
        hidden_layer_size=16, encoder_layer_output_size=8, k=4,
        candidate_pool_size=6, eval_every=1, p_dropout_features=0.0,
    )
    data = create_link_pred_data(g, cfg)
    return g, cfg, data


class TestFloatFeatures:
    def test_data_carries_floats(self, setup):
        g, cfg, data = setup
        assert data.item_features_float.shape == (30, 16)
        assert data.float_dims()[NODE_ITEM] == 16
        assert data.float_dims()[NODE_USER] == 0

    def test_forward_uses_floats(self, setup):
        g, cfg, data = setup
        train_s, _, _ = create_samplers(cfg, data, randomization=False)
        batch = train_s.sample_batch(np.arange(cfg.batch_size))
        info = sage.get_feature_info(g)
        params, bn = sage.init_sage_params(
            jax.random.PRNGKey(0), cfg, info, float_dims=data.float_dims()
        )
        logits, _ = sage.forward(
            params, bn, batch, data.user_features, data.item_features, cfg,
            item_features_float=data.item_features_float,
        )
        assert np.isfinite(np.asarray(logits)).all()
        # perturbing the float features must change the output
        logits2, _ = sage.forward(
            params, bn, batch, data.user_features, data.item_features, cfg,
            item_features_float=data.item_features_float + 1.0,
        )
        assert not np.allclose(np.asarray(logits), np.asarray(logits2))

    def test_pipeline_end_to_end(self, setup):
        g, cfg, data = setup
        stats = encdec_pipeline.run_pipeline(cfg, data, log_fn=lambda *_: None)
        assert np.isfinite(stats.loss)
