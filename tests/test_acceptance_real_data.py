"""Opt-in REAL-data acceptance (VERDICT r1 item 8).

The synthetic acceptance (``test_acceptance_movielens.py``) always runs; this
module proves metric parity on the GENUINE datasets the moment they are
reachable — mirroring the reference gate, which downloads ml-1m in CI
(``/root/reference/tests/test_acceptance_movielens.py:53-60``). Gating:

* MovieLens: runs when the raw ml-1m files are present at ``$ML1M_RAW_DIR``
  (default ``data/original``), or downloads them first when
  ``ALLOW_DOWNLOAD=1`` (the build container has no egress, so CI there
  skips; any networked runner executes it).
* H&M: runs when ``DATA_HOST_URL`` points at the private parquet host
  (reference ``run_download_data.py:14-22``).

Configs and floors are the reference's exactly: 1,000 transactions, 100
epochs, seed 42, loss < 0.5 / recall@12 > 0.0015 / precision@12 > 0.01 —
our hit test uses the intended semantics (items vs ground truth, see
``train/encdec_pipeline.py``), which is strictly harder than the
reference's position-vs-id comparison.
"""
import os

import pytest

ML1M_DIR = os.environ.get("ML1M_RAW_DIR", "data/original")
_ALLOW_DL = os.environ.get("ALLOW_DOWNLOAD") == "1"


def _ml1m_available() -> bool:
    if os.path.exists(os.path.join(ML1M_DIR, "ratings.dat")):
        return True
    if not _ALLOW_DL:
        return False
    try:
        from laplace_gnn_recommendation_tpu.data.download import (
            download_movielens,
        )

        download_movielens(ML1M_DIR)
        return os.path.exists(os.path.join(ML1M_DIR, "ratings.dat"))
    except Exception:
        return False


@pytest.mark.skipif(
    not _ml1m_available(),
    reason="real ml-1m not present (set ML1M_RAW_DIR or ALLOW_DOWNLOAD=1)",
)
def test_real_movielens_pipeline(tmp_path):
    import dataclasses

    from laplace_gnn_recommendation_tpu.configs import (
        Config,
        preprocessing_config,
    )
    from laplace_gnn_recommendation_tpu.data import preprocess_movielens
    from laplace_gnn_recommendation_tpu.data.link_pred_data import (
        create_link_pred_data_from_artifacts,
    )
    from laplace_gnn_recommendation_tpu.train.encdec_pipeline import (
        run_pipeline,
    )

    art = str(tmp_path / "derived")
    pcfg = dataclasses.replace(preprocessing_config, data_size=1000)
    preprocess_movielens.preprocess(pcfg, ML1M_DIR, art)
    cfg = Config(
        epochs=100, k=12, num_gnn_layers=2, num_linear_layers=2,
        hidden_layer_size=128, encoder_layer_output_size=64,
        conv_agg_type="add", heterogeneous_prop_agg_type="sum",
        learning_rate=0.01, batch_size=24, num_neighbors=64,
        n_hop_neighbors=3, candidate_pool_size=20,
        positive_edges_ratio=0.5, negative_edges_ratio=3.0,
        eval_every=4, seed=42,
    )
    data, _ = create_link_pred_data_from_artifacts(art, cfg)
    stats = run_pipeline(cfg, data, log_fn=lambda *_: None)
    # reference floors (tests/test_acceptance_movielens.py:58-60)
    assert stats.loss < 0.5, stats
    assert stats.recall_test > 0.0015, stats
    assert stats.precision_test > 0.01, stats


@pytest.mark.skipif(
    os.environ.get("DATA_HOST_URL") is None,
    reason="DATA_HOST_URL not set (private H&M data host)",
)
def test_real_fashion_lightgcn(tmp_path):
    """H&M LightGCN acceptance — the reference shipped this commented out
    because of the private host (tests/test_acceptance_lightgcn.py:49-55);
    opt-in here with the canonical-BPR translation of its floors."""
    import dataclasses

    from laplace_gnn_recommendation_tpu.configs import (
        LightGCNConfig,
        preprocessing_config,
    )
    from laplace_gnn_recommendation_tpu.data import preprocess_fashion
    from laplace_gnn_recommendation_tpu.data.download import download_fashion
    from laplace_gnn_recommendation_tpu.data.lightgcn_data import (
        lightgcn_data_from_hetero,
    )
    from laplace_gnn_recommendation_tpu.train.lightgcn_pipeline import train

    raw = str(tmp_path / "raw")
    download_fashion(raw)
    art = str(tmp_path / "derived")
    pcfg = dataclasses.replace(preprocessing_config, data_size=1000)
    artifacts = preprocess_fashion.preprocess(pcfg, raw, art)
    data = lightgcn_data_from_hetero(artifacts.graph)
    cfg = LightGCNConfig(
        epochs=1000, eval_every=200, hidden_layer_size=32, num_iterations=4,
        batch_size=128, seed=42, k=12,
    )
    stats = train(cfg, data, export=False, log_fn=lambda *_: None)
    # reference floors (tests/test_acceptance_lightgcn.py:53-55) — its
    # loss < -0.8 reflects the legacy sign quirk; canonical BPR must instead
    # drop below ln 2 (the no-signal value)
    assert stats.loss < 0.693, stats
    assert stats.recall_test > 0.01, stats
    assert stats.precision_test > 0.0008, stats
