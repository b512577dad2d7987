"""CLI smoke tests: preprocess → encoder → submission through cli.run()."""
import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    raw = tmp_path_factory.mktemp("cli_raw")
    rng = np.random.default_rng(0)
    users = [f"{i}::M::25::15::55117" for i in range(1, 16)]
    (raw / "users.dat").write_text("\n".join(users) + "\n")
    movies = [f"{i}::Movie {i} (199{i % 10})::Comedy|Drama" for i in range(1, 13)]
    (raw / "movies.dat").write_text("\n".join(movies) + "\n")
    rows, ts = [], 956700000
    for u in range(1, 16):
        for m in rng.choice(np.arange(1, 13), size=5, replace=False):
            ts += 100
            rows.append(f"{u}::{m}::4::{ts}")
    (raw / "ratings.dat").write_text("\n".join(rows) + "\n")
    return str(raw)


def run_cli(argv, cwd=None):
    from laplace_gnn_recommendation_tpu import cli

    old_argv, old_cwd = sys.argv, os.getcwd()
    try:
        if cwd:
            os.chdir(cwd)
        sys.argv = ["cli.py"] + argv
        cli.run()
    finally:
        sys.argv = old_argv
        os.chdir(old_cwd)


class TestCLI:
    def test_preprocess_encoder_submission(self, raw_dir, tmp_path):
        art = str(tmp_path / "derived")
        run_cli(["--type", "preprocess", "--raw_dir", raw_dir, "--artifact_dir", art])
        assert os.path.exists(os.path.join(art, "graph.npz"))

        run_cli(
            [
                "--type", "encoder", "--artifact_dir", art,
                "--epochs", "1", "--batch_size", "4", "--num_neighbors", "8",
                "--k", "4", "--candidate_pool_size", "4",
                "--hidden_layer_size", "8", "--encoder_layer_output_size", "8",
                "--save_model", "true", "--eval_every", "5",
            ],
            cwd=str(tmp_path),
        )
        saved = os.listdir(tmp_path / "model" / "saved")
        assert any(f.startswith("model_") for f in saved)

        run_cli(
            [
                "--type", "submission", "--artifact_dir", art,
                "--batch_size", "4", "--num_neighbors", "8",
                "--k", "4", "--candidate_pool_size", "4",
                "--hidden_layer_size", "8", "--encoder_layer_output_size", "8",
            ],
            cwd=str(tmp_path),
        )
        sub = (tmp_path / "data" / "derived" / "submission.csv").read_text()
        assert sub.startswith("customer_id,prediction\n")
        assert len(sub.strip().split("\n")) == 16  # 15 users + header

    def test_bad_type_rejected(self):
        with pytest.raises(SystemExit):
            run_cli(["--type", "bogus"])


class TestOrbaxCheckpoint:
    def test_roundtrip(self, tmp_path):
        import jax.numpy as jnp

        from laplace_gnn_recommendation_tpu.train.checkpoint import (
            load_checkpoint_orbax,
            save_checkpoint_orbax,
        )

        state = {"w": jnp.arange(6.0).reshape(2, 3), "b": {"x": jnp.ones((4,))}}
        path = str(tmp_path / "ckpt")
        save_checkpoint_orbax(path, state)
        import jax

        zeroed = jax.tree.map(jnp.zeros_like, state)
        restored = load_checkpoint_orbax(path, zeroed)
        np.testing.assert_array_equal(np.asarray(restored["w"]), np.arange(6).reshape(2, 3))
        np.testing.assert_array_equal(np.asarray(restored["b"]["x"]), np.ones(4))
