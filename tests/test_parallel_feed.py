"""Multi-worker sampler feed (reference DataLoader ``num_workers``,
``config.py:41`` / ``data/data_loader.py:48-50`` — realized as
GIL-releasing sampler threads, ``sampler.parallel_epoch_batches``)."""
import numpy as np
import pytest

from laplace_gnn_recommendation_tpu.configs import Config
from laplace_gnn_recommendation_tpu.data.link_pred_data import (
    create_link_pred_data,
    create_samplers,
)
from laplace_gnn_recommendation_tpu.data.sampler import parallel_epoch_batches
from laplace_gnn_recommendation_tpu.data.synthetic import random_hetero_graph


@pytest.fixture(scope="module")
def setup():
    g = random_hetero_graph(seed=11, num_users=60, num_items=40, avg_degree=6)
    cfg = Config(
        epochs=2, batch_size=8, num_neighbors=8, n_hop_neighbors=2,
        hidden_layer_size=16, encoder_layer_output_size=8, k=4,
        candidate_pool_size=6, eval_every=1,
    )
    data = create_link_pred_data(g, cfg)
    return cfg, data


class TestParallelEpoch:
    def test_schedule_parity_with_serial(self, setup):
        cfg, data = setup
        train_s, _, _ = create_samplers(cfg, data, seed=3)
        serial = list(train_s.epoch_batches(shuffle=False))
        train_p, _, _ = create_samplers(cfg, data, seed=3)
        par = list(
            parallel_epoch_batches(train_p, num_workers=3, shuffle=False)
        )
        assert len(par) == len(serial)
        # identical epoch order: every batch sees the same seed users
        for a, b in zip(serial, par):
            np.testing.assert_array_equal(
                np.asarray(a.seed_users), np.asarray(b.seed_users)
            )
            assert a.edge_src.shape == b.edge_src.shape

    def test_every_user_covered_once(self, setup):
        cfg, data = setup
        train_s, _, _ = create_samplers(cfg, data, seed=5)
        seen = []
        for b in parallel_epoch_batches(train_s, num_workers=2, shuffle=True):
            seen.extend(np.asarray(b.seed_users).tolist())
        deg = train_s.users.degrees
        connected = np.flatnonzero(deg > 0)
        # every connected user appears; the only extras are the final
        # batch's pad (repeats of its last user)
        assert set(seen) == set(connected.tolist())
        assert len(seen) == -(-len(connected) // cfg.batch_size) * cfg.batch_size

    def test_truncations_merge(self, setup):
        cfg, data = setup
        train_s, _, _ = create_samplers(cfg, data, seed=7)
        before = dict(train_s.truncations)
        for _ in parallel_epoch_batches(train_s, num_workers=2):
            pass
        # counters still a plain dict with the same keys, merged (≥ before)
        for k, v in before.items():
            assert train_s.truncations[k] >= v

    def test_worker_error_propagates(self, setup):
        cfg, data = setup
        train_s, _, _ = create_samplers(cfg, data, seed=9)

        class Boom(Exception):
            pass

        def bad_clone(seed):
            raise Boom("factory failure")

        train_s.clone = bad_clone
        with pytest.raises(Boom):
            list(parallel_epoch_batches(train_s, num_workers=2))


class TestPipelineWithWorkers:
    def test_run_pipeline_num_workers(self, setup):
        import dataclasses

        from laplace_gnn_recommendation_tpu.train import encdec_pipeline

        cfg, data = setup
        cfg2 = dataclasses.replace(cfg, num_workers=2)
        stats = encdec_pipeline.run_pipeline(
            cfg2, data, log_fn=lambda *_: None
        )
        assert np.isfinite(stats.loss)


class TestAbandonment:
    def test_early_close_releases_workers(self, setup):
        """Abandoning the generator mid-epoch must cancel the workers
        (bounded puts + finally-block drain) and still merge their
        truncation counters — no threads left blocked holding batches."""
        import threading

        cfg, data = setup
        train_s, _, _ = create_samplers(cfg, data, seed=5)
        before = threading.active_count()
        it = parallel_epoch_batches(
            train_s, num_workers=3, shuffle=True, buffer_per_worker=1
        )
        next(it)
        next(it)
        it.close()  # consumer walks away mid-epoch (bench-style capped loop)
        deadline = 50
        while threading.active_count() > before and deadline:
            deadline -= 1
            import time

            time.sleep(0.1)
        assert threading.active_count() <= before, (
            "worker threads still alive after generator close"
        )
        # truncation merge ran in the finally block (counters are ints ≥ 0)
        assert all(v >= 0 for v in train_s.truncations.values())
