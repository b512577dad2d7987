"""ETL: MovieLens .dat parsing, H&M parquet preprocessing, artifact
round-trips, and the submission writer."""
import os

import numpy as np
import pytest

from laplace_gnn_recommendation_tpu.configs import Config, preprocessing_config
from laplace_gnn_recommendation_tpu.constants import EDGE_KEY, NODE_ITEM, NODE_USER
from laplace_gnn_recommendation_tpu.data.etl import (
    create_ids_and_maps,
    encode_labels,
    filter_unconnected,
    load_artifacts,
)
from laplace_gnn_recommendation_tpu.data.link_pred_data import (
    create_link_pred_data_from_artifacts,
)
from laplace_gnn_recommendation_tpu.data import preprocess_movielens


@pytest.fixture(scope="module")
def movielens_raw(tmp_path_factory):
    """A tiny synthetic ml-1m-format dataset (5 users, 6 movies, 18 ratings)."""
    raw = tmp_path_factory.mktemp("ml_raw")
    users = [
        "1::F::1::10::48067", "2::M::56::16::70072", "3::M::25::15::55117",
        "4::M::45::7::02460", "5::M::25::20::55455",
    ]
    (raw / "users.dat").write_text("\n".join(users) + "\n")
    movies = [
        "1::Toy Story (1995)::Animation|Children's|Comedy",
        "2::Jumanji (1995)::Adventure|Children's|Fantasy",
        "3::Grumpier Old Men (1995)::Comedy|Romance",
        "4::Waiting to Exhale (1995)::Comedy|Drama",
        "5::Father of the Bride Part II (1995)::Comedy",
        "6::Heat (1995)::Action|Crime|Thriller",
    ]
    (raw / "movies.dat").write_text("\n".join(movies) + "\n")
    rng = np.random.default_rng(0)
    rows = []
    ts = 956700000
    for u in range(1, 6):
        movies_for_u = rng.choice(np.arange(1, 7), size=4, replace=False)
        for m in movies_for_u:
            ts += 100
            rows.append(f"{u}::{m}::5::{ts}")
    (raw / "ratings.dat").write_text("\n".join(rows) + "\n")
    return str(raw)


class TestPrimitives:
    def test_encode_labels_sorted_codes(self):
        got = encode_labels(np.array(["b", "a", "b", "c"]))
        np.testing.assert_array_equal(got, [1, 0, 1, 2])

    def test_ids_and_maps_roundtrip(self):
        fwd, rev = create_ids_and_maps(np.array([30, 10, 20]))
        assert fwd == {0: 30, 1: 10, 2: 20}
        assert rev == {30: 0, 10: 1, 20: 2}

    def test_filter_unconnected(self):
        keep = filter_unconnected(np.array([1, 2, 3]), np.array([1, 3, 3]))
        np.testing.assert_array_equal(keep, [True, False, True])


class TestMovieLensPreprocess:
    def test_end_to_end(self, movielens_raw, tmp_path):
        art_dir = str(tmp_path / "derived")
        a = preprocess_movielens.preprocess(
            preprocessing_config, movielens_raw, art_dir
        )
        g = a.graph
        assert g.num_nodes[NODE_USER] == 5 and g.num_nodes[NODE_ITEM] == 6
        eu, ei = g.edges[EDGE_KEY]
        assert len(eu) == 20
        # features: year + genre one-hots for articles, 4 cols for users
        assert g.node_features[NODE_USER].shape == (5, 4)
        assert g.node_features[NODE_ITEM].shape[0] == 6
        # per-user leave-last-2: exactly one test + one val edge per user
        for u in range(5):
            rows = eu == u
            assert a.test_mask[rows].sum() == 1
            assert a.val_mask[rows].sum() == 1
        # artifacts round-trip
        b = load_artifacts(art_dir)
        np.testing.assert_array_equal(b.train_mask, a.train_mask)
        assert b.customer_id_map_forward["0"] == "1"

    def test_data_size_cap(self, movielens_raw, tmp_path):
        import dataclasses

        cfg = dataclasses.replace(preprocessing_config, data_size=10)
        a = preprocess_movielens.preprocess(
            cfg, movielens_raw, str(tmp_path / "derived")
        )
        assert len(a.graph.edges[EDGE_KEY][0]) == 10

    def test_pipeline_runs_on_artifacts(self, movielens_raw, tmp_path):
        from laplace_gnn_recommendation_tpu.train.encdec_pipeline import run_pipeline

        art_dir = str(tmp_path / "derived")
        preprocess_movielens.preprocess(preprocessing_config, movielens_raw, art_dir)
        cfg = Config(
            epochs=1, batch_size=2, num_neighbors=8, n_hop_neighbors=2,
            hidden_layer_size=8, encoder_layer_output_size=8,
            num_gnn_layers=2, num_linear_layers=2, k=4, candidate_pool_size=4,
            eval_every=10,
        )
        data, _ = create_link_pred_data_from_artifacts(art_dir, cfg)
        stats = run_pipeline(cfg, data, log_fn=lambda *_: None)
        assert np.isfinite(stats.loss)


class TestFashionPreprocess:
    def test_end_to_end(self, tmp_path):
        import pandas as pd

        from laplace_gnn_recommendation_tpu.data import preprocess_fashion

        raw = tmp_path / "raw"
        raw.mkdir()
        rng = np.random.default_rng(1)
        customers = pd.DataFrame({
            "customer_id": [f"c{i}" for i in range(6)],
            "postal_code": ["11", "11", "22", "22", "33", "33"],
            "FN": [1.0, 0, 1.0, 0, 1.0, 0],
            "age": [20, 30, 40, 20, 30, 40],
            "club_member_status": ["ACTIVE"] * 6,
            "fashion_news_frequency": ["NONE"] * 6,
            "Active": [1.0] * 6,
        })
        customers.to_parquet(raw / "customers.parquet")
        articles = pd.DataFrame({
            "article_id": [100 + i for i in range(8)],
            "product_code": [1, 1, 2, 2, 3, 3, 4, 4],
            "product_type_no": [7, 7, 8, 8, 9, 9, 7, 7],
            "graphical_appearance_no": [5] * 8,
            "colour_group_code": [1, 2, 1, 2, 3, 3, 1, 2],
        })
        articles.to_parquet(raw / "articles.parquet")
        n_tx = 40
        tx = pd.DataFrame({
            "customer_id": rng.choice(customers["customer_id"], n_tx),
            "article_id": rng.choice(articles["article_id"], n_tx),
            "price": rng.uniform(1, 10, n_tx),
            "t_dat": pd.to_datetime("2020-01-01")
            + pd.to_timedelta(np.arange(n_tx), unit="D"),
        })
        tx.to_parquet(raw / "transactions_train.parquet")

        art_dir = str(tmp_path / "derived")
        a = preprocess_fashion.preprocess(
            preprocessing_config, str(raw), art_dir, include_extra_nodes=True
        )
        g = a.graph
        assert NODE_USER in g.node_features and NODE_ITEM in g.node_features
        assert a.popular_items is not None and len(a.popular_items) > 0
        assert a.location_for_user is not None
        # extra colour node type present with has_color edges
        from laplace_gnn_recommendation_tpu.constants import EDGE_KEY_EXTRA, NODE_EXTRA

        assert NODE_EXTRA in g.num_nodes
        assert EDGE_KEY_EXTRA in g.edges
        # dedup means every (user, item) pair unique
        eu, ei = g.edges[EDGE_KEY]
        assert len(set(zip(eu.tolist(), ei.tolist()))) == len(eu)


class TestSubmission:
    def test_submission_csv(self, movielens_raw, tmp_path):
        from laplace_gnn_recommendation_tpu.train.encdec_pipeline import run_pipeline
        from laplace_gnn_recommendation_tpu.train.submission import submission_pipeline

        art_dir = str(tmp_path / "derived")
        preprocess_movielens.preprocess(preprocessing_config, movielens_raw, art_dir)
        cfg = Config(
            epochs=1, batch_size=2, num_neighbors=8, n_hop_neighbors=2,
            hidden_layer_size=8, encoder_layer_output_size=8,
            num_gnn_layers=2, num_linear_layers=2, k=4, candidate_pool_size=4,
            eval_every=10,
        )
        data, artifacts = create_link_pred_data_from_artifacts(art_dir, cfg)
        _, params, bn_state = run_pipeline(
            cfg, data, log_fn=lambda *_: None, return_state=True
        )
        out = submission_pipeline(
            cfg, data,
            {str(k): v for k, v in artifacts.customer_id_map_forward.items()},
            {str(k): v for k, v in artifacts.article_id_map_forward.items()},
            out_path=str(tmp_path / "submission.csv"),
            params_bn=(params, bn_state),
        )
        lines = open(out).read().strip().split("\n")
        assert lines[0] == "customer_id,prediction"
        assert len(lines) == 6  # 5 users + header
        # predictions are raw article ids (1..6), space-joined
        for line in lines[1:]:
            cid, preds = line.split(",")
            assert int(cid) in range(1, 6)
            for p in preds.split():
                assert int(p) in range(1, 7)


class TestPandasGraphBuilder:
    """Reference pinsage/builder.py:16-127 counterpart."""

    def test_build_bipartite_from_frames(self):
        import pandas as pd

        from laplace_gnn_recommendation_tpu.constants import EDGE_KEY
        from laplace_gnn_recommendation_tpu.data.pandas_builder import (
            PandasGraphBuilder,
        )
        from laplace_gnn_recommendation_tpu.types import EdgeType

        users = pd.DataFrame(
            {"user_id": ["XYZZY", "FOO", "BAR"],
             "country": ["US", "CN", "CN"], "age": [25, 24, 23]}
        )
        games = pd.DataFrame(
            {"game_id": [1, 2], "title": ["Minecraft", "Tetris"],
             "score": [0.9, 0.7]}
        )
        plays = pd.DataFrame(
            {"user_id": ["XYZZY", "FOO", "FOO", "BAR"],
             "game_id": [1, 1, 2, 2]}
        )
        b = PandasGraphBuilder()
        b.add_entities(users, "user_id", "customer", feature_cols=["country", "age"])
        b.add_entities(games, "game_id", "article", feature_cols=["title"],
                       float_feature_cols=["score"])
        b.add_binary_relations(plays, "user_id", "game_id", EDGE_KEY.rel)
        g, id_maps = b.build()
        assert g.num_nodes == {"customer": 3, "article": 2}
        et = EdgeType("customer", EDGE_KEY.rel, "article")
        s, d = g.edges[et]
        assert len(s) == 4
        # FOO plays both games
        foo = id_maps["customer"]["FOO"]
        np.testing.assert_array_equal(np.sort(d[s == foo]), [0, 1])
        assert g.node_features["customer"].shape == (3, 2)
        assert g.node_features_float["article"].shape == (2, 1)
        # drops straight into the pipelines
        from laplace_gnn_recommendation_tpu.configs import Config
        from laplace_gnn_recommendation_tpu.data.link_pred_data import (
            create_link_pred_data,
        )

        data = create_link_pred_data(
            g, Config(batch_size=2, candidate_pool_size=2, k=2)
        )
        assert data.num_users == 3

    def test_duplicate_pk_rejected(self):
        import pandas as pd

        from laplace_gnn_recommendation_tpu.data.pandas_builder import (
            PandasGraphBuilder,
        )

        with np.testing.assert_raises(ValueError):
            PandasGraphBuilder().add_entities(
                pd.DataFrame({"id": [1, 1]}), "id", "customer"
            )


class TestSweepYaml:
    def test_load_sweep_yaml_matches_search_space(self):
        from laplace_gnn_recommendation_tpu.train.hpo import load_sweep_yaml

        space = load_sweep_yaml("sweep.yaml")
        assert space["hidden_layer_size"] == [32, 64, 128, 256, 512]
        assert space["num_gnn_layers"] == [1, 2, 3, 4]
        assert space["negative_edges_ratio"] == [1.0, 2.0, 5.0, 10.0, 20.0]
        assert space["learning_rate"] == [1e-2, 1e-3, 1e-4, 1e-5]
