"""Auxiliary subsystems: tensor utils, HPO search, profiling, visualization."""
import numpy as np
import pytest

from laplace_gnn_recommendation_tpu.configs import Config, link_pred_config
from laplace_gnn_recommendation_tpu.train.hpo import (
    SEARCH_SPACE,
    make_trial_config,
    run_study,
    sample_trial,
)
from laplace_gnn_recommendation_tpu.utils.profiling import Profiler, Roofline, Timer
from laplace_gnn_recommendation_tpu.utils.tensor import (
    difference_1d,
    flatten,
    intersection_1d,
    padded_stack,
)


class TestTensorUtils:
    def test_intersection(self):
        np.testing.assert_array_equal(
            intersection_1d(np.array([1, 2, 3]), np.array([2, 3, 4])), [2, 3]
        )

    def test_difference_preserves_order(self):
        got = difference_1d(np.array([5, 1, 9, 3]), np.array([1, 3]))
        np.testing.assert_array_equal(got, [5, 9])

    def test_padded_stack(self):
        got = padded_stack([np.array([1, 2]), np.array([3])], value=-7)
        np.testing.assert_array_equal(got, [[1, 2], [3, -7]])

    def test_flatten(self):
        assert flatten([[1, 2], [3]]) == [1, 2, 3]


class TestHPO:
    def test_sample_trial_in_space(self):
        rng = np.random.default_rng(0)
        p = sample_trial(rng)
        for k, v in p.items():
            if k == "n_hop_neighbors":
                assert v == p["num_gnn_layers"]
            else:
                assert v in SEARCH_SPACE[k]

    def test_trial_config_valid(self):
        rng = np.random.default_rng(1)
        cfg = make_trial_config(link_pred_config, sample_trial(rng))
        cfg.check_validity()

    def test_trial_config_lightgcn(self):
        """make_trial_config also works on LightGCNConfig (hpo_hm.py drives
        the at-scale study with it; it has no candidate_pool_size)."""
        from laplace_gnn_recommendation_tpu.configs import LightGCNConfig

        cfg = make_trial_config(
            LightGCNConfig(), {"learning_rate": 1e-2, "Lambda": 3e-6}
        )
        assert cfg.learning_rate == 1e-2 and cfg.Lambda == 3e-6

    def test_run_study_minimizes(self, tmp_path):
        calls = []

        def objective(cfg: Config) -> float:
            calls.append(cfg)
            return abs(cfg.learning_rate - 1e-4)

        best = run_study(
            objective, link_pred_config, n_trials=25, seed=0,
            out_csv=str(tmp_path / "trials.csv"),
        )
        assert len(calls) == 25
        assert best["learning_rate"] == pytest.approx(1e-4)
        lines = open(tmp_path / "trials.csv").read().strip().split("\n")
        assert len(lines) == 26


class TestProfiling:
    def test_roofline_memory_bound(self):
        r = Roofline(name="spmm", seconds=1e-3, flops=1e9, bytes_moved=500e6)
        assert r.bound == "memory"
        assert 0 < r.fraction_of_peak <= 1.0
        assert "spmm" in r.report()

    def test_roofline_compute_bound(self):
        r = Roofline(name="mm", seconds=1e-3, flops=300e9, bytes_moved=1e6)
        assert r.bound == "compute"

    def test_profiler_counts(self, tmp_path):
        p = Profiler(every=100, dump_path=str(tmp_path / "s.dmp"))
        p.start()
        sum(range(1000))
        p.stop()
        assert p.count == 1

    def test_timer(self):
        with Timer() as t:
            sum(range(10000))
        assert t.elapsed > 0


class TestVisualize:
    def test_renders_png(self, tmp_path):
        from laplace_gnn_recommendation_tpu.constants import EDGE_KEY
        from laplace_gnn_recommendation_tpu.data.graph import HostCSR
        from laplace_gnn_recommendation_tpu.data.sampler import SubgraphSampler
        from laplace_gnn_recommendation_tpu.data.synthetic import manual_dummy_graph
        from laplace_gnn_recommendation_tpu.utils.visualize import visualize_batch

        g = manual_dummy_graph()
        eu, ei = g.edges[EDGE_KEY]
        cfg = Config(batch_size=2, num_neighbors=8, n_hop_neighbors=2, k=4)
        s = SubgraphSampler(
            cfg,
            HostCSR.from_edges(eu, ei, 3, 6),
            HostCSR.from_edges(ei, eu, 6, 3),
            train=True,
            randomization=False,
        )
        batch = s.sample_batch(np.array([0, 1]))
        out = tmp_path / "batch.png"
        visualize_batch(batch, str(out))
        assert out.stat().st_size > 1000
