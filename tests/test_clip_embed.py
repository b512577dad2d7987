"""CLIP embedding PRODUCTION → fashion-preprocessing consumption.

Closes the reference's notebook-only gap (SURVEY §2a "CLIP embedding
notebooks"): the producer (`data/clip_embed.py`) runs both CLIP towers as
jitted JAX calls and writes the npz artifact that
``preprocess_fashion.preprocess`` loads (reference
``run_preprocessing_fashion.py:129-162``). Uses a tiny config-initialised
model — pretrained ViT-B/32 weights are env-gated (zero egress), but the
format and compute path are identical."""
import dataclasses

import numpy as np
import pytest

from laplace_gnn_recommendation_tpu.constants import NODE_ITEM
from laplace_gnn_recommendation_tpu.data.clip_embed import (
    ClipEmbedder,
    hash_tokenize,
    produce_article_embeddings,
)


@pytest.fixture(scope="module")
def tiny_embedder():
    from transformers import CLIPConfig, CLIPTextConfig, CLIPVisionConfig

    # bos/eos ids MUST be in-vocab: the text tower pools at the first
    # position whose id == eos_token_id (with the default 49407 and a tiny
    # vocab it would silently pool the input-independent bos position)
    cfg = CLIPConfig(
        text_config=CLIPTextConfig(
            vocab_size=512, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=77,
            bos_token_id=510, eos_token_id=511,
        ).to_dict(),
        vision_config=CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=8,
        ).to_dict(),
        projection_dim=24,
    )
    return ClipEmbedder(config=cfg, batch_size=4)


class TestTokenizer:
    def test_shapes_and_framing(self):
        ids = hash_tokenize(["red wool sweater", ""], vocab_size=512)
        assert ids.shape == (2, 77)
        assert ids[0, 0] == min(49406, 510)  # bos
        assert (ids[:, -1] == min(49407, 511)).all()  # eos padding

    def test_deterministic(self):
        a = hash_tokenize(["denim jacket"], 512)
        b = hash_tokenize(["denim jacket"], 512)
        assert (a == b).all()


class TestEmbedder:
    def test_text_features(self, tiny_embedder):
        texts = ["red wool sweater", "blue denim jacket", "red wool sweater"]
        v = tiny_embedder.embed_texts(texts)
        assert v.shape == (3, 24) and v.dtype == np.float32
        np.testing.assert_allclose(
            np.linalg.norm(v, axis=1), 1.0, rtol=1e-3
        )
        # same text → same vector; different text → different vector
        np.testing.assert_allclose(v[0], v[2], rtol=1e-5)
        assert not np.allclose(v[0], v[1])

    def test_image_features_and_batch_padding(self, tiny_embedder):
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 256, size=(6, 32, 32, 3), dtype=np.uint8)
        v = tiny_embedder.embed_images(imgs)  # 6 = 1.5 × batch_size
        assert v.shape == (6, 24)
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, rtol=1e-3)
        # padded final batch must not perturb real rows: recompute row 5 alone
        v5 = tiny_embedder.embed_images(imgs[5:6])
        np.testing.assert_allclose(v[5], v5[0], rtol=2e-3, atol=2e-3)


class TestProduceConsume:
    def test_artifact_feeds_fashion_preprocess(self, tmp_path, tiny_embedder):
        import pandas as pd

        from laplace_gnn_recommendation_tpu.configs import preprocessing_config
        from laplace_gnn_recommendation_tpu.data import preprocess_fashion

        raw = tmp_path / "raw"
        raw.mkdir()
        rng = np.random.default_rng(1)
        customers = pd.DataFrame({
            "customer_id": [f"c{i}" for i in range(5)],
            "postal_code": ["1", "1", "2", "2", "3"],
            "FN": [1.0, 0, 1.0, 0, 1.0],
            "age": [20, 30, 40, 20, 30],
            "club_member_status": ["ACTIVE"] * 5,
            "fashion_news_frequency": ["NONE"] * 5,
            "Active": [1.0] * 5,
        })
        customers.to_parquet(raw / "customers.parquet")
        raw_ids = [100 + i for i in range(6)]
        articles = pd.DataFrame({
            "article_id": raw_ids,
            "product_code": [1, 1, 2, 2, 3, 3],
            "product_type_no": [7, 7, 8, 8, 9, 9],
            "graphical_appearance_no": [5] * 6,
            "colour_group_code": [1, 2, 1, 2, 3, 3],
        })
        articles.to_parquet(raw / "articles.parquet")
        n_tx = 30
        tx = pd.DataFrame({
            "customer_id": rng.choice(customers["customer_id"], n_tx),
            "article_id": rng.choice(articles["article_id"], n_tx),
            "price": rng.uniform(1, 10, n_tx),
            "t_dat": pd.to_datetime("2020-01-01")
            + pd.to_timedelta(np.arange(n_tx), unit="D"),
        })
        tx.to_parquet(raw / "transactions_train.parquet")

        # PRODUCE: both modalities through the jitted towers
        texts = [f"article {r} cotton shirt style {r % 3}" for r in raw_ids]
        imgs = rng.integers(0, 256, size=(6, 32, 32, 3), dtype=np.uint8)
        produce_article_embeddings(
            str(raw), raw_ids, texts=texts, images=imgs,
            embedder=tiny_embedder,
        )

        # CONSUME: the public preprocess() with both load flags on
        pcfg = dataclasses.replace(
            preprocessing_config,
            load_image_embedding=True, load_text_embedding=True,
        )
        a = preprocess_fashion.preprocess(
            pcfg, str(raw), str(tmp_path / "derived")
        )
        ff = a.graph.node_features_float[NODE_ITEM]
        # image ++ text concat, remapped to contiguous ids
        assert ff.shape[1] == 48 and ff.shape[0] == a.graph.num_nodes[NODE_ITEM]
        assert np.isfinite(ff).all()
        # rows must be the produced vectors (up to the id remap): every row
        # of the concat matches SOME produced (image ++ text) row exactly
        prod = np.concatenate(
            [tiny_embedder.embed_images(imgs), tiny_embedder.embed_texts(texts)],
            axis=1,
        )
        for row in ff:
            d = np.abs(prod - row[None, :]).max(axis=1)
            assert d.min() < 1e-5
