"""Blocked one-hot-matmul segment sum vs the plain segment-sum path."""
import jax
import numpy as np
import pytest
import jax.numpy as jnp

from laplace_gnn_recommendation_tpu.configs import LightGCNConfig
from laplace_gnn_recommendation_tpu.data.graph import BipartiteGraph
from laplace_gnn_recommendation_tpu.data.synthetic import random_bipartite_edges
from laplace_gnn_recommendation_tpu.models.lightgcn import init_lightgcn, lightgcn_forward
from laplace_gnn_recommendation_tpu.ops.spmm import lightgcn_propagate, propagate_bipartite
from laplace_gnn_recommendation_tpu.ops.spmm_blocked import (
    BlockedGraph,
    BlockedSegmentPlan,
    lightgcn_propagate_blocked,
    propagate_blocked,
)
from laplace_gnn_recommendation_tpu.train.lightgcn_pipeline import maybe_dense


@pytest.fixture(scope="module")
def setup():
    eu, ei = random_bipartite_edges(seed=7, num_users=70, num_items=50, avg_degree=9)
    g = BipartiteGraph.from_edges(eu, ei, 70, 50, pad_multiple=32)
    bg = BlockedGraph.from_graph(g, edges_per_chunk=16, rows_per_chunk=4)
    rng = np.random.default_rng(0)
    xu = jnp.asarray(rng.normal(size=(70, 8)).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=(50, 8)).astype(np.float32))
    return g, bg, eu, ei, xu, xi


class TestBlockedSegmentSum:
    def test_single_step_parity(self, setup):
        g, bg, eu, ei, xu, xi = setup
        wu, wi = propagate_bipartite(g, xu, xi)
        gu, gi = propagate_blocked(bg, xu, xi)
        np.testing.assert_allclose(np.asarray(gu), np.asarray(wu), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gi), np.asarray(wi), rtol=1e-5, atol=1e-6)

    def test_k_hop_parity(self, setup):
        g, bg, eu, ei, xu, xi = setup
        wu, wi = lightgcn_propagate(g, xu, xi, 3)
        gu, gi = lightgcn_propagate_blocked(bg, xu, xi, 3)
        np.testing.assert_allclose(np.asarray(gu), np.asarray(wu), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gi), np.asarray(wi), rtol=1e-4, atol=1e-5)

    def test_host_edges_constructor_matches(self, setup):
        g, bg, eu, ei, xu, xi = setup
        bg2 = BlockedGraph.from_host_edges(eu, ei, 70, 50, 16, 4)
        gu, _ = propagate_blocked(bg, xu, xi)
        gu2, _ = propagate_blocked(bg2, xu, xi)
        np.testing.assert_allclose(np.asarray(gu), np.asarray(gu2), rtol=1e-6)

    def test_row_budget_respected(self, setup):
        g, bg, *_ = setup
        for plan in (bg.to_user, bg.to_item):
            local = np.asarray(plan.local_row)
            assert local.max() < plan.rows_per_chunk
            # row_ids pads are OOB sentinels
            rows = np.asarray(plan.row_ids)
            assert ((rows <= plan.num_rows)).all()

    def test_sorted_combine_matches_scatter(self):
        """The cumsum-diff combine (the H&M-scale scatter replacement) is
        numerically interchangeable with the scatter path."""
        from laplace_gnn_recommendation_tpu.ops.spmm_blocked import (
            blocked_segment_sum,
        )

        eu, ei = random_bipartite_edges(
            seed=3, num_users=400, num_items=120, avg_degree=6
        )
        order = np.lexsort((ei, eu))
        du = np.bincount(eu, minlength=400)
        di = np.bincount(ei, minlength=120)
        w = (1.0 / np.sqrt(np.maximum(du[eu] * di[ei], 1.0))).astype(np.float32)
        rng = np.random.default_rng(1)
        tab = jnp.asarray(rng.normal(size=(120, 8)).astype(np.float32))
        kw = dict(edges_per_chunk=16, rows_per_chunk=4, chunk_bucket=8)
        p_scat = BlockedSegmentPlan.from_edges(
            eu[order], ei[order], w[order], 400, **kw
        )
        p_sort = BlockedSegmentPlan.from_edges(
            eu[order], ei[order], w[order], 400, sorted_combine=True, **kw
        )
        assert p_sort.ends is not None and p_sort.sorted_combine
        # flattened row ids must be non-decreasing for the sorted combine
        flat = np.asarray(p_sort.row_ids).reshape(-1)
        assert (np.diff(flat) >= 0).all()
        a = blocked_segment_sum(p_scat, tab)
        b = blocked_segment_sum(p_sort, tab)
        # the combine's residual is the f32 granularity at the cumsum's
        # magnitude (absolute, not relative — see _combine_sorted docstring)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    def test_sorted_combine_windowed_gather(self, monkeypatch):
        """Windowed boundary gather (fast-zone cumsum windows) must match
        the plain ends-gather combine and the scatter reference."""
        import laplace_gnn_recommendation_tpu.ops.spmm_blocked as sb

        monkeypatch.setattr(sb, "COMBINE_WINDOW", 64)
        eu, ei = random_bipartite_edges(
            seed=5, num_users=300, num_items=90, avg_degree=7
        )
        order = np.lexsort((ei, eu))
        du = np.bincount(eu, minlength=300)
        di = np.bincount(ei, minlength=90)
        w = (1.0 / np.sqrt(np.maximum(du[eu] * di[ei], 1.0))).astype(np.float32)
        rng = np.random.default_rng(4)
        tab = jnp.asarray(rng.normal(size=(90, 8)).astype(np.float32))
        kw = dict(edges_per_chunk=16, rows_per_chunk=4, chunk_bucket=8)
        p_scat = BlockedSegmentPlan.from_edges(
            eu[order], ei[order], w[order], 300, **kw
        )
        p_sort = BlockedSegmentPlan.from_edges(
            eu[order], ei[order], w[order], 300, sorted_combine=True, **kw
        )
        assert p_sort.combine_idx is not None  # windowing really engaged
        assert sum(p_sort.combine_counts) == 300
        a = sb.blocked_segment_sum(p_scat, tab)
        b = sb.blocked_segment_sum(p_sort, tab)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    def test_sorted_combine_scan_path(self, monkeypatch):
        """Sorted combine through the big-graph lax.scan path (runtime pad
        chunks appended after the bucketed plan must stay inert)."""
        import laplace_gnn_recommendation_tpu.ops.spmm_blocked as sb

        monkeypatch.setattr(sb, "MAX_CHUNKS_PER_SLICE", 4)
        eu, ei = random_bipartite_edges(
            seed=9, num_users=150, num_items=60, avg_degree=5
        )
        order = np.lexsort((ei, eu))
        w = np.ones(len(eu), np.float32)
        rng = np.random.default_rng(2)
        tab = jnp.asarray(rng.normal(size=(60, 8)).astype(np.float32))
        p = BlockedSegmentPlan.from_edges(
            eu[order], ei[order], w[order], 150,
            edges_per_chunk=16, rows_per_chunk=4, chunk_bucket=1,
            sorted_combine=True,
        )
        assert p.src.shape[0] > 4  # really exercises the scan path
        got = sb.blocked_segment_sum(p, tab)
        want = jax.ops.segment_sum(
            w[order][:, None] * np.asarray(tab)[ei[order]], eu[order],
            num_segments=150,
        )
        # unnormalized w=1 weights → larger cumsum magnitude → larger f32
        # granularity residual (see _combine_sorted docstring)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )

    def test_gradient_parity(self, setup):
        g, bg, eu, ei, xu, xi = setup

        def loss_plain(u, i):
            a, b = propagate_bipartite(g, u, i)
            return jnp.sum(a ** 2) + jnp.sum(b ** 2)

        def loss_blocked(u, i):
            a, b = propagate_blocked(bg, u, i)
            return jnp.sum(a ** 2) + jnp.sum(b ** 2)

        g1 = jax.grad(loss_plain, (0, 1))(xu, xi)
        g2 = jax.grad(loss_blocked, (0, 1))(xu, xi)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    def test_kloop_gradient_parity_self_adjoint_vjp(self, setup):
        """The whole-loop self-adjoint VJP (ops/multiscale.py) must match
        autodiff through the plain tier's unrolled loop — for both the
        blocked tier and the dense tier, at K>1 where the per-iteration
        cotangent chain differs most from the single forward-on-cotangents."""
        from laplace_gnn_recommendation_tpu.ops.spmm import lightgcn_propagate
        from laplace_gnn_recommendation_tpu.ops.spmm_blocked import (
            lightgcn_propagate_blocked,
        )
        from laplace_gnn_recommendation_tpu.ops.spmm_dense import (
            DenseAdjacency,
            lightgcn_propagate_dense,
        )

        g, bg, eu, ei, xu, xi = setup
        d = DenseAdjacency.from_graph(g)
        t = jnp.asarray(
            np.random.default_rng(5).normal(size=(70, 8)).astype(np.float32)
        )

        def loss(fwd, op):
            def f(u, i):
                a, b = fwd(op, u, i, 3)
                return jnp.sum(a * t) + jnp.sum(b[:40] ** 2)
            return f

        g_plain = jax.grad(loss(lightgcn_propagate, g), (0, 1))(xu, xi)
        g_blk = jax.grad(loss(lightgcn_propagate_blocked, bg), (0, 1))(xu, xi)
        g_dense = jax.grad(loss(lightgcn_propagate_dense, d), (0, 1))(xu, xi)
        for a, b in zip(g_plain, g_blk):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )
        for a, b in zip(g_plain, g_dense):
            # bf16 adjacency → looser band (matches the fwd parity band)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-2
            )

    def test_forward_dispatch_and_fallback(self, setup):
        g, bg, *_ = setup
        params = init_lightgcn(jax.random.PRNGKey(0), 70, 50, 8)
        uf1, _, if1, _ = lightgcn_forward(params, g, 2)
        uf2, _, if2, _ = lightgcn_forward(params, bg, 2)
        np.testing.assert_allclose(np.asarray(uf1), np.asarray(uf2), rtol=1e-4, atol=1e-5)
        # budget 0 → blocked layout (not raw BipartiteGraph)
        cfg = LightGCNConfig(dense_bytes_budget=0)
        assert isinstance(maybe_dense(cfg, g), BlockedGraph)


class TestGatherBF16:
    def test_bf16_gather_close_to_f32(self):
        import dataclasses

        import jax.numpy as jnp
        import numpy as np

        from laplace_gnn_recommendation_tpu.data.graph import BipartiteGraph
        from laplace_gnn_recommendation_tpu.data.synthetic import (
            random_bipartite_edges,
        )
        from laplace_gnn_recommendation_tpu.ops.spmm import propagate_bipartite
        from laplace_gnn_recommendation_tpu.ops.spmm_blocked import (
            BlockedGraph,
            propagate_blocked,
        )

        eu, ei = random_bipartite_edges(
            seed=2, num_users=300, num_items=200, avg_degree=8
        )
        g = BipartiteGraph.from_edges(eu, ei, 300, 200)
        bg16 = dataclasses.replace(BlockedGraph.from_graph(g), gather_bf16=True)
        rng = np.random.default_rng(0)
        xu = jnp.asarray(rng.normal(size=(300, 16)).astype(np.float32))
        xi = jnp.asarray(rng.normal(size=(200, 16)).astype(np.float32))
        ru, ri = propagate_bipartite(g, xu, xi)
        bu, bi = propagate_blocked(bg16, xu, xi)
        np.testing.assert_allclose(np.asarray(bu), np.asarray(ru), rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(bi), np.asarray(ri), rtol=2e-2, atol=2e-2)

    def test_select_propagation_sets_flag_for_big_graphs(self):
        from laplace_gnn_recommendation_tpu.configs import LightGCNConfig
        from laplace_gnn_recommendation_tpu.data.graph import BipartiteGraph
        from laplace_gnn_recommendation_tpu.data.synthetic import (
            random_bipartite_edges,
        )
        from laplace_gnn_recommendation_tpu.ops.spmm_blocked import BlockedGraph
        from laplace_gnn_recommendation_tpu.train.lightgcn_pipeline import (
            select_propagation,
        )

        eu, ei = random_bipartite_edges(
            seed=0, num_users=1000, num_items=100, avg_degree=3
        )
        # node-count METADATA drives the flag; edges stay tiny
        g = BipartiteGraph.from_edges(eu, ei, 1 << 19, 100)
        cfg = LightGCNConfig(propagation="blocked")
        op = select_propagation(cfg, g)
        assert isinstance(op, BlockedGraph) and op.gather_bf16
        g2 = BipartiteGraph.from_edges(eu, ei, 1000, 100)
        assert not select_propagation(cfg, g2).gather_bf16


class TestSrcSlicedGather:
    def test_sliced_plan_matches_segment_sum(self):
        import jax.numpy as jnp

        from laplace_gnn_recommendation_tpu.data.graph import BipartiteGraph
        from laplace_gnn_recommendation_tpu.data.synthetic import (
            random_bipartite_edges,
        )
        from laplace_gnn_recommendation_tpu.ops.spmm import propagate_bipartite
        from laplace_gnn_recommendation_tpu.ops.spmm_blocked import (
            BlockedSegmentPlan,
            blocked_segment_sum,
        )

        eu, ei = random_bipartite_edges(
            seed=4, num_users=500, num_items=300, avg_degree=7
        )
        g = BipartiteGraph.from_edges(eu, ei, 500, 300)
        eu_h, ei_h, w_h, eu_im, ei_im, w_im = g.host_arrays()
        rng = np.random.default_rng(1)
        xu = jnp.asarray(rng.normal(size=(500, 16)).astype(np.float32))
        xi = jnp.asarray(rng.normal(size=(300, 16)).astype(np.float32))
        ru, ri = propagate_bipartite(g, xu, xi)
        # force slicing with a tiny slice width (users split into 4 slices)
        plan = BlockedSegmentPlan.from_edges_src_sliced(
            ei_im, eu_im, w_im, 300, 500, slice_rows=128, chunk_bucket=8,
            build_slice_ends=True,
        )
        assert plan.num_src_slices == 4
        assert plan.slice_ends is not None  # per-slice sorted combine engaged
        got = blocked_segment_sum(plan, xu)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ri), rtol=1e-5, atol=1e-5)
        # with bf16 gathers too
        got16 = blocked_segment_sum(plan, xu, gather_bf16=True)
        np.testing.assert_allclose(np.asarray(got16), np.asarray(ri), rtol=2e-2, atol=2e-2)

    def test_sliced_combine_through_k2_subsplit(self, monkeypatch):
        """Per-slice sorted combine stays correct when slices sub-split
        into k2 scan steps (MAX_CHUNKS_PER_SLICE exceeded): the partials
        reshape back to per-slice order before the cumsum."""
        import jax.numpy as jnp

        import laplace_gnn_recommendation_tpu.ops.spmm_blocked as sb
        from laplace_gnn_recommendation_tpu.data.graph import BipartiteGraph
        from laplace_gnn_recommendation_tpu.data.synthetic import (
            random_bipartite_edges,
        )
        from laplace_gnn_recommendation_tpu.ops.spmm import propagate_bipartite

        monkeypatch.setattr(sb, "MAX_CHUNKS_PER_SLICE", 4)
        eu, ei = random_bipartite_edges(
            seed=6, num_users=400, num_items=200, avg_degree=6
        )
        g = BipartiteGraph.from_edges(eu, ei, 400, 200)
        _, _, _, eu_im, ei_im, w_im = g.host_arrays()
        rng = np.random.default_rng(2)
        xu = jnp.asarray(rng.normal(size=(400, 8)).astype(np.float32))
        _, ri = propagate_bipartite(
            g, xu, jnp.zeros((200, 8), jnp.float32)
        )
        plan = sb.BlockedSegmentPlan.from_edges_src_sliced(
            ei_im, eu_im, w_im, 200, 400, slice_rows=128, chunk_bucket=2,
            edges_per_chunk=16, rows_per_chunk=4, build_slice_ends=True,
        )
        assert plan.slice_ends is not None
        cs = plan.src.shape[0] // plan.num_src_slices
        assert cs > 4  # really sub-splits
        got = sb.blocked_segment_sum(plan, xu)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ri), rtol=1e-4, atol=1e-5
        )

    def test_from_graph_slices_big_source_tables(self):
        from laplace_gnn_recommendation_tpu.data.graph import BipartiteGraph
        from laplace_gnn_recommendation_tpu.data.synthetic import (
            random_bipartite_edges,
        )
        from laplace_gnn_recommendation_tpu.ops.spmm_blocked import BlockedGraph

        eu, ei = random_bipartite_edges(
            seed=0, num_users=600, num_items=100, avg_degree=3
        )
        # user-table metadata past the threshold → to_item slices its source
        g = BipartiteGraph.from_edges(eu, ei, (1 << 18) + 8, 100)
        bg = BlockedGraph.from_graph(g)
        assert bg.to_item.num_src_slices == 3  # ceil(2^18+8 / 2^17)
        assert bg.to_user.num_src_slices == 1
