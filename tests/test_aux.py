"""Auxiliary subsystems: tensor utils, HPO search, profiling, visualization."""
import os

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


    def test_successive_halving_prunes_and_resumes(self, tmp_path):
        """The SH engine halves survivors per rung, passes CUMULATIVE
        budgets, and re-uses each trial's work_dir so rung-2 resumes
        rung-1's state (the hyperband counterpart, sweep.yaml:24-27)."""
        from laplace_gnn_recommendation_tpu.train.hpo import (
            run_successive_halving,
        )

        seen = []

        def objective(cfg, budget, trial_dir):
            # "training": value improves with budget; best lr wins at
            # every budget; record resume evidence via a state file
            state_f = os.path.join(trial_dir, "state.txt")
            prev = int(open(state_f).read()) if os.path.exists(state_f) else 0
            assert budget > prev  # cumulative budgets, never re-train past
            open(state_f, "w").write(str(budget))
            seen.append((cfg.learning_rate, budget, prev))
            return abs(cfg.learning_rate - 1e-3) + 1.0 / budget

        params = [{"learning_rate": lr} for lr in (1e-2, 1e-3, 1e-4, 1e-5)]
        out = run_successive_halving(
            objective, link_pred_config, param_sets=params,
            rungs=(10, 40), eta=2, work_dir=str(tmp_path / "sh"),
            log_fn=lambda *_: None,
        )
        # rung 0: all 4 at budget 10; rung 1: top-2 at budget 40
        assert [b for _, b, _ in seen] == [10, 10, 10, 10, 40, 40]
        # rung-1 trials resumed from rung-0 state (prev=10)
        assert all(p == 10 for _, b, p in seen if b == 40)
        assert out["best"]["learning_rate"] == pytest.approx(1e-3)
        assert len(out["history"]) == 6

    def test_successive_halving_lightgcn_resume_wiring(self, tmp_path):
        """Integration: the SH objective contract wired into the real
        lightgcn pipeline's checkpoint/resume — rung 2 continues rung 1's
        optimizer state from the trial dir instead of restarting."""
        import dataclasses as dc

        from laplace_gnn_recommendation_tpu.configs import LightGCNConfig
        from laplace_gnn_recommendation_tpu.data.lightgcn_data import (
            create_lightgcn_data,
        )
        from laplace_gnn_recommendation_tpu.data.synthetic import (
            random_bipartite_edges,
        )
        from laplace_gnn_recommendation_tpu.train import lightgcn_pipeline
        from laplace_gnn_recommendation_tpu.train.hpo import (
            run_successive_halving,
        )

        eu, ei = random_bipartite_edges(
            seed=3, num_users=60, num_items=40, avg_degree=6
        )
        data = create_lightgcn_data(eu, ei, 60, 40)
        base = LightGCNConfig(
            hidden_layer_size=8, num_iterations=1, batch_size=32,
            eval_every=1000, num_recommendations=4,
        )
        resumed_from = []

        def objective(cfg, budget, trial_dir):
            cfg = dc.replace(
                cfg, epochs=budget, artifact_dir=trial_dir, resume=True,
                checkpoint_every=max(1, budget - 1),
            )
            msgs = []
            stats = lightgcn_pipeline.train(
                cfg, data, export=False, log_fn=msgs.append
            )
            resumed_from.extend(m for m in msgs if "Resuming" in m)
            return stats.loss

        out = run_successive_halving(
            objective, base,
            param_sets=[{"learning_rate": 1e-2}, {"learning_rate": 1e-3}],
            rungs=(4, 8), eta=2, work_dir=str(tmp_path / "sh"),
            log_fn=lambda *_: None,
        )
        # the rung-2 run really resumed (checkpoint model_3 -> iteration 4)
        assert any("iteration 4" in m for m in resumed_from), resumed_from
        assert np.isfinite(out["best_value"])


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
