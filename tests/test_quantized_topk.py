"""int8 quantized streaming retrieval (interpret mode on CPU; the kernel's
int8 MXU path is verified exact on TPU — see kernel docstring)."""
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_recommendation_tpu.ops.topk_pallas import (
    exclusion_mask,
    row_quantize,
    streaming_mips_topk,
    streaming_mips_topk_int8,
)


class TestRowQuantize:
    def test_dequantize_error_bound(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
        q, s = row_quantize(x)
        assert q.dtype == jnp.int8 and s.shape == (1, 64)
        deq = np.asarray(q).astype(np.float32) * np.asarray(s).T
        err = np.abs(deq - np.asarray(x))
        # symmetric int8: per-row error ≤ scale/2 = absmax/254
        bound = np.abs(np.asarray(x)).max(axis=1, keepdims=True) / 254 + 1e-7
        assert (err <= bound).all()

    def test_zero_rows(self):
        x = jnp.zeros((4, 8), jnp.float32)
        q, s = row_quantize(x)
        np.testing.assert_array_equal(np.asarray(q), 0)
        np.testing.assert_array_equal(np.asarray(s), 0.0)


class TestInt8StreamingTopK:
    def test_overlap_with_f32(self):
        rng = np.random.default_rng(1)
        B, I, D, k = 16, 2048, 32, 10
        u = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
        it = jnp.asarray(rng.normal(size=(I, D)).astype(np.float32))
        q, s = row_quantize(it)
        _, i8 = streaming_mips_topk_int8(u, q, s, k, tile=512)
        _, if32 = streaming_mips_topk(u, it, k, tile=512)
        overlap = np.mean([
            len(set(np.asarray(i8)[b]) & set(np.asarray(if32)[b])) / k
            for b in range(B)
        ])
        assert overlap >= 0.85   # measured 0.98 on TPU at 8k items

    def test_well_separated_exact(self):
        """With clearly separated scores, int8 must return the exact top-k."""
        I, D = 1024, 16
        it = np.zeros((I, D), np.float32)
        winners = [3, 700, 1023]
        for rank, pos in enumerate(winners):
            it[pos] = 10.0 - rank
        u = jnp.ones((2, D), jnp.float32)
        q, s = row_quantize(jnp.asarray(it))
        _, idx = streaming_mips_topk_int8(u, q, s, 3, tile=256)
        for b in range(2):
            assert list(np.asarray(idx)[b]) == winners

    def test_exclusion_mask_respected(self):
        rng = np.random.default_rng(2)
        B, I, D = 4, 512, 16
        u = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
        it = jnp.asarray(rng.normal(size=(I, D)).astype(np.float32))
        q, s = row_quantize(it)
        excl = jnp.asarray(rng.integers(0, I, (B, 5)).astype(np.int32))
        cnt = jnp.full(B, 5, np.int32)
        mask = exclusion_mask(I, excl, cnt)
        _, idx = streaming_mips_topk_int8(u, q, s, 8, excl_mask=mask, tile=128)
        for b in range(B):
            assert not (set(np.asarray(excl)[b]) & set(np.asarray(idx)[b]))

    def test_descending_scores(self):
        rng = np.random.default_rng(3)
        u = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
        it = jnp.asarray(rng.normal(size=(512, 16)).astype(np.float32))
        q, s = row_quantize(it)
        v, _ = streaming_mips_topk_int8(u, q, s, 6, tile=128)
        assert (np.diff(np.asarray(v), axis=1) <= 1e-6).all()


class TestQuantizedServer:
    def test_falls_back_off_tpu(self):
        """On the CPU test backend the server must silently serve f32."""
        from laplace_gnn_recommendation_tpu.serving import RetrievalServer

        rng = np.random.default_rng(4)
        ue = rng.normal(size=(20, 8)).astype(np.float32)
        ie = rng.normal(size=(512, 8)).astype(np.float32)
        srv = RetrievalServer(ue, ie, k=4, quantized=True)
        assert srv.quantized is False  # CPU backend
        items, _ = srv.recommend([1, 2])
        expect = np.argsort(-(ue[1] @ ie.T))[:4]
        np.testing.assert_array_equal(items[0], expect)


class TestQuantizedPaddedCatalog:
    def test_tail_mask_blocks_pad_rows(self):
        """Unaligned catalogs pad to the 512 tile with zero rows that must
        never win a slot — the RetrievalServer internal-padding contract
        (serving.py quantized path), checked here in interpret mode."""
        import jax.numpy as jnp

        from laplace_gnn_recommendation_tpu.ops.topk_pallas import (
            row_quantize,
            streaming_mips_topk_int8,
        )

        rng = np.random.default_rng(7)
        true_i = 300
        i_pad = 512
        it = np.zeros((i_pad, 8), np.float32)
        # all-negative scores: zero pad rows would otherwise score 0 and win
        it[:true_i] = -np.abs(rng.normal(size=(true_i, 8))) - 0.1
        u = jnp.asarray(np.abs(rng.normal(size=(4, 8))).astype(np.float32))
        q, s = row_quantize(jnp.asarray(it))
        tail = jnp.broadcast_to(
            (jnp.arange(i_pad) >= true_i).astype(jnp.int8)[None, :],
            (4, i_pad),
        )
        _, idx = streaming_mips_topk_int8(
            u, q, s, 5, excl_mask=tail, tile=128, interpret=True
        )
        assert (np.asarray(idx) < true_i).all()
