"""Pallas streaming MIPS top-k vs the XLA materializing path (interpreter
mode on the CPU backend; the same kernel runs compiled on TPU with exact
index match — see ops/topk_pallas.py module docstring for the measured
XLA-vs-streaming dispatch picture)."""
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_recommendation_tpu.ops.topk import mips_topk
from laplace_gnn_recommendation_tpu.ops.topk_pallas import streaming_mips_topk


class TestStreamingTopK:
    @pytest.mark.parametrize("b,d,i,k,tile", [
        (8, 32, 1024, 4, 256),
        (16, 64, 2048, 12, 512),
        (3, 16, 512, 1, 128),
    ])
    def test_matches_xla(self, b, d, i, k, tile):
        rng = np.random.default_rng(b + i)
        u = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
        it = jnp.asarray(rng.normal(size=(i, d)).astype(np.float32))
        v1, i1 = mips_topk(u, it, k)
        v2, i2 = streaming_mips_topk(u, it, k, tile=tile)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_descending_order(self):
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
        it = jnp.asarray(rng.normal(size=(512, 16)).astype(np.float32))
        v, _ = streaming_mips_topk(u, it, 8, tile=128)
        v = np.asarray(v)
        assert (np.diff(v, axis=1) <= 1e-6).all()

    def test_topk_spans_tiles(self):
        """Best item placed in every tile in turn must always be found."""
        d = 16
        it = np.zeros((1024, d), np.float32)
        u = np.ones((1, d), np.float32)
        for pos in (0, 255, 256, 767, 1023):
            items = it.copy()
            items[pos] = 10.0
            _, idx = streaming_mips_topk(
                jnp.asarray(u), jnp.asarray(items), 1, tile=256
            )
            assert int(idx[0, 0]) == pos


class TestMaskedStreamingTopK:
    def test_matches_masked_xla(self):
        import jax.numpy as jnp
        from laplace_gnn_recommendation_tpu.ops.topk_pallas import (
            exclusion_mask,
            streaming_mips_topk_masked,
        )

        rng = np.random.default_rng(4)
        u = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
        it = jnp.asarray(rng.normal(size=(1024, 32)).astype(np.float32))
        excl = jnp.asarray(rng.integers(0, 1024, (8, 7)).astype(np.int32))
        cnt = jnp.asarray(np.full(8, 7, np.int32))
        v1, i1 = mips_topk(u, it, 5, excl, cnt)
        mask = exclusion_mask(1024, excl, cnt)
        v2, i2 = streaming_mips_topk_masked(u, it, mask, 5, tile=256)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_excluded_never_returned(self):
        import jax.numpy as jnp
        from laplace_gnn_recommendation_tpu.ops.topk_pallas import (
            exclusion_mask,
            streaming_mips_topk_masked,
        )

        u = jnp.ones((2, 8))
        it = jnp.ones((256, 8))
        it = it.at[7].set(100.0).at[200].set(100.0)  # clear winners
        excl = jnp.asarray([[7, -1], [200, -1]], jnp.int32)
        cnt = jnp.asarray([1, 1], jnp.int32)
        mask = exclusion_mask(256, excl, cnt)
        _, idx = streaming_mips_topk_masked(u, it, mask, 2, tile=128)
        assert 7 not in np.asarray(idx[0])
        assert 200 not in np.asarray(idx[1])
