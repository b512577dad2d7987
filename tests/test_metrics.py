"""Batched metric kernels vs naive per-user Python oracles.

The oracles re-implement the reference formulas (``utils/metrics.py:6-57``)
independently, so numeric parity here implies parity with the reference's
reported metrics.
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from laplace_gnn_recommendation_tpu.ops.metrics import (
    map_at_k,
    ndcg_at_k,
    ranking_metrics,
    recall_precision_at_k,
    topk_hits,
)
from laplace_gnn_recommendation_tpu.ops.topk import (
    apply_exclusion,
    hierarchical_topk,
    masked_topk,
    mips_topk,
)


def naive_metrics(topk, gts, k):
    """Reference utils/metrics.py semantics, per-user Python."""
    recalls, precisions, ndcgs = [], [], []
    for row, gt in zip(topk, gts):
        hits = [int(x in gt) for x in row]
        nh = sum(hits)
        recalls.append(nh / len(gt))
        precisions.append(nh / k)
        dcg = sum(h / math.log2(j + 2) for j, h in enumerate(hits))
        ideal = min(len(gt), k)
        idcg = sum(1 / math.log2(j + 2) for j in range(ideal))
        ndcgs.append(dcg / idcg if idcg > 0 else 0.0)
    return np.mean(recalls), np.mean(precisions), np.mean(ndcgs)


@pytest.fixture(scope="module")
def random_case():
    rng = np.random.default_rng(0)
    b, k, num_items = 17, 6, 50
    topk = np.stack([rng.choice(num_items, k, replace=False) for _ in range(b)])
    gts = [list(rng.choice(num_items, rng.integers(1, 9), replace=False)) for _ in range(b)]
    g = max(len(x) for x in gts)
    gt_items = np.full((b, g), -1, np.int32)
    gt_count = np.zeros(b, np.int32)
    for i, x in enumerate(gts):
        gt_items[i, : len(x)] = x
        gt_count[i] = len(x)
    return topk.astype(np.int32), gts, gt_items, gt_count, k


class TestRankingMetrics:
    def test_matches_naive(self, random_case):
        topk, gts, gt_items, gt_count, k = random_case
        recall, precision, ndcg = ranking_metrics(
            jnp.asarray(topk), jnp.asarray(gt_items), jnp.asarray(gt_count), k
        )
        er, ep, en = naive_metrics(topk, gts, k)
        assert abs(float(recall) - er) < 1e-6
        assert abs(float(precision) - ep) < 1e-6
        assert abs(float(ndcg) - en) < 1e-6

    def test_empty_users_masked(self, random_case):
        topk, gts, gt_items, gt_count, k = random_case
        gt_count2 = gt_count.copy()
        gt_count2[3] = 0  # user with no ground truth is excluded from means
        r = topk_hits(jnp.asarray(topk), jnp.asarray(gt_items), jnp.asarray(gt_count2))
        recall, precision = recall_precision_at_k(r, jnp.asarray(gt_count2), k)
        keep = [i for i in range(len(gts)) if i != 3]
        er, ep, _ = naive_metrics(topk[keep], [gts[i] for i in keep], k)
        assert abs(float(recall) - er) < 1e-6
        assert abs(float(precision) - ep) < 1e-6

    def test_map_at_k_oracle(self):
        # hand-computed: hits at ranks 1 and 3, |gt|=2, k=3
        topk = jnp.asarray([[10, 11, 12]])
        gt = jnp.asarray([[10, 12, -1]])
        cnt = jnp.asarray([2])
        r = topk_hits(topk, gt, cnt)
        ap = float(map_at_k(r, cnt, 3))
        assert abs(ap - (1 / 1 + 2 / 3) / 2) < 1e-6


class TestTopK:
    def test_masked_topk_excludes(self):
        scores = jnp.asarray(np.arange(20, dtype=np.float32).reshape(2, 10))
        excl = jnp.asarray([[9, 8], [9, -1]])
        cnt = jnp.asarray([2, 1])
        _, idx = masked_topk(scores, 3, excl, cnt)
        np.testing.assert_array_equal(np.asarray(idx), [[7, 6, 5], [8, 7, 6]])

    def test_exclusion_equivalent_to_topk_then_remove(self):
        """Masking-then-topk must equal the reference's topk(k+|excl|)-then-
        set-difference (utils/metrics_lightgcn.py:139-142)."""
        rng = np.random.default_rng(5)
        scores = rng.normal(size=(8, 30)).astype(np.float32)
        k = 5
        for row in range(8):
            excl = rng.choice(30, 4, replace=False)
            masked = scores[row].copy()
            masked[excl] = -(1 << 10)
            want = np.argsort(-masked, kind="stable")[:k]
            got = np.asarray(
                masked_topk(
                    jnp.asarray(scores[row : row + 1]), k,
                    jnp.asarray(excl[None, :].astype(np.int32)),
                    jnp.asarray([4]),
                )[1]
            )[0]
            np.testing.assert_array_equal(np.sort(got), np.sort(want))

    def test_mips_topk(self):
        rng = np.random.default_rng(2)
        u = rng.normal(size=(4, 8)).astype(np.float32)
        it = rng.normal(size=(16, 8)).astype(np.float32)
        vals, idx = mips_topk(jnp.asarray(u), jnp.asarray(it), 3)
        want = np.argsort(-(u @ it.T), axis=1)[:, :3]
        np.testing.assert_array_equal(np.asarray(idx), want)


class TestHierarchicalTopK:
    def test_matches_lax_topk_on_grouped_width(self):
        """Width divisible by the group size with ≥ k groups takes the
        two-stage path; values AND ids must match lax.top_k exactly on
        tie-free random scores."""
        import jax

        rng = np.random.default_rng(7)
        scores = jnp.asarray(rng.normal(size=(16, 2048)).astype(np.float32))
        for k in (1, 5, 8):
            v0, i0 = jax.lax.top_k(scores, k)
            v1, i1 = hierarchical_topk(scores, k)
            np.testing.assert_allclose(np.asarray(v0), np.asarray(v1))
            np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))

    def test_adversarial_grouping(self):
        """All true top-k packed into ONE group (the case a naive
        one-candidate-per-group reduction gets wrong)."""
        scores = np.zeros((2, 1024), np.float32)
        scores[0, 300:305] = [9, 8, 7, 6, 5]     # all in group 1 (tg=256)
        scores[1, ::200] = [5, 4, 3, 2, 1, 0.5]  # spread across groups
        v, i = hierarchical_topk(jnp.asarray(scores), 5, group=256)
        np.testing.assert_array_equal(np.asarray(i[0]), [300, 301, 302, 303, 304])
        np.testing.assert_array_equal(np.asarray(i[1]), [0, 200, 400, 600, 800])

    def test_ties_return_equal_values(self):
        """Duplicate values across groups: values must still equal
        lax.top_k's (ids may legally differ between ties)."""
        import jax

        rng = np.random.default_rng(8)
        scores = jnp.asarray(
            rng.integers(0, 10, (8, 1024)).astype(np.float32)
        )
        v0, _ = jax.lax.top_k(scores, 6)
        v1, i1 = hierarchical_topk(scores, 6)
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1))
        # returned ids really do carry the returned values
        picked = np.take_along_axis(np.asarray(scores), np.asarray(i1), 1)
        np.testing.assert_allclose(picked, np.asarray(v1))
        # within a row, no id repeats
        for row in np.asarray(i1):
            assert len(set(row.tolist())) == len(row)

    def test_fallback_on_indivisible_width(self):
        import jax

        rng = np.random.default_rng(9)
        scores = jnp.asarray(rng.normal(size=(4, 100)).astype(np.float32))
        v0, i0 = jax.lax.top_k(scores, 5)
        v1, i1 = hierarchical_topk(scores, 5)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1))


class TestShardedTopK:
    def test_sharded_matches_single_device(self, mesh8):
        from laplace_gnn_recommendation_tpu.ops.topk import sharded_mips_topk

        rng = np.random.default_rng(3)
        u = rng.normal(size=(6, 16)).astype(np.float32)
        it = rng.normal(size=(64, 16)).astype(np.float32)  # 64 % 4 == 0
        excl = rng.integers(0, 64, (6, 5)).astype(np.int32)
        cnt = np.full(6, 5, np.int32)
        vals1, idx1 = mips_topk(
            jnp.asarray(u), jnp.asarray(it), 4, jnp.asarray(excl), jnp.asarray(cnt)
        )
        vals2, idx2 = sharded_mips_topk(
            mesh8, jnp.asarray(u), jnp.asarray(it), 4, jnp.asarray(excl), jnp.asarray(cnt)
        )
        np.testing.assert_allclose(np.asarray(vals1), np.asarray(vals2), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx1), np.asarray(idx2))
