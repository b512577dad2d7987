"""Native C++ sampler: validity and parity with the Python samplers."""
import numpy as np
import pytest

from laplace_gnn_recommendation_tpu import native
from laplace_gnn_recommendation_tpu.configs import Config
from laplace_gnn_recommendation_tpu.data.graph import HostCSR
from laplace_gnn_recommendation_tpu.data.sampler import SubgraphSampler
from laplace_gnn_recommendation_tpu.data.synthetic import random_bipartite_edges

pytestmark = pytest.mark.skipif(native.LIB is None, reason="no C++ toolchain")


@pytest.fixture(scope="module")
def csrs():
    eu, ei = random_bipartite_edges(seed=3, num_users=100, num_items=80, avg_degree=6)
    return (
        HostCSR.from_edges(eu, ei, 100, 80),
        HostCSR.from_edges(ei, eu, 80, 100),
        set(zip(eu.tolist(), ei.tolist())),
    )


class TestNhop:
    def test_edges_are_real_and_exclude_seed(self, csrs):
        ucsr, icsr, real = csrs
        seeds = np.arange(20)
        src, dst, off = native.nhop_sample(
            ucsr.row_ptr, ucsr.cols, icsr.row_ptr, icsr.cols,
            100, 80, seeds, 3, 64, 42,
        )
        assert off[-1] == len(src)
        for i, seed in enumerate(seeds):
            s_slice = src[off[i]: off[i + 1]]
            d_slice = dst[off[i]: off[i + 1]]
            for s, d in zip(s_slice, d_slice):
                assert (int(s), int(d)) in real
                assert int(s) != int(seed)  # seed's direct edges excluded

    def test_deterministic_given_seed(self, csrs):
        ucsr, icsr, _ = csrs
        a = native.nhop_sample(
            ucsr.row_ptr, ucsr.cols, icsr.row_ptr, icsr.cols,
            100, 80, np.arange(5), 2, 8, 7,
        )
        b = native.nhop_sample(
            ucsr.row_ptr, ucsr.cols, icsr.row_ptr, icsr.cols,
            100, 80, np.arange(5), 2, 8, 7,
        )
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])

    def test_matches_python_when_no_cuts(self, csrs):
        """With fanout caps larger than any frontier, BFS is deterministic —
        native and Python must produce identical edge sets."""
        ucsr, icsr, _ = csrs
        cfg = Config(batch_size=4, num_neighbors=10_000, n_hop_neighbors=3, k=12)
        s_py = SubgraphSampler(cfg, ucsr, icsr, train=True, use_native=False, seed=0)
        for u in range(6):
            py_src, py_dst = s_py._n_hop_edges(u)
            nat_src, nat_dst, off = native.nhop_sample(
                ucsr.row_ptr, ucsr.cols, icsr.row_ptr, icsr.cols,
                100, 80, np.array([u], np.int32), 3, 10_000, 5,
            )
            assert set(zip(py_src.tolist(), py_dst.tolist())) == set(
                zip(nat_src.tolist(), nat_dst.tolist())
            )

    def test_buffer_growth(self, csrs):
        ucsr, icsr, _ = csrs
        src, dst, off = native.nhop_sample(
            ucsr.row_ptr, ucsr.cols, icsr.row_ptr, icsr.cols,
            100, 80, np.arange(30), 3, 64, 1, max_edges_hint=8,
        )
        assert len(src) == off[-1] > 8  # grew past the tiny hint


class TestFrontier:
    def test_weights_and_topk(self, csrs):
        ucsr, icsr, _ = csrs
        fs, fd, fw = native.pinsage_frontier(
            ucsr.row_ptr, ucsr.cols, icsr.row_ptr, icsr.cols,
            np.arange(10), 2, 0.5, 10, 3, 11,
        )
        assert (fw > 0).all()
        for s in range(10):
            assert (fd == s).sum() <= 3
        assert not np.any(fs == fd)

    def test_walk_step_valid(self, csrs):
        ucsr, icsr, real = csrs
        out = native.walk_step(
            ucsr.row_ptr, ucsr.cols, icsr.row_ptr, icsr.cols, np.arange(20), 5
        )
        assert ((out >= -1) & (out < 80)).all()


class TestIntegration:
    def test_sampler_uses_native_and_batches_valid(self, csrs):
        ucsr, icsr, real = csrs
        cfg = Config(batch_size=8, num_neighbors=16, n_hop_neighbors=2, k=6)
        s = SubgraphSampler(cfg, ucsr, icsr, train=True, seed=3, use_native=True)
        assert s._native is not None
        b = s.sample_batch(np.arange(8))
        em = np.asarray(b.edge_mask)
        uids = np.asarray(b.user_ids)[np.asarray(b.edge_src)[em]]
        iids = np.asarray(b.item_ids)[np.asarray(b.edge_dst)[em]]
        for u, i in zip(uids, iids):
            assert (int(u), int(i)) in real


class TestRejectionFrontier:
    """The occurrence-rejection frontier branch of ``bfs_seed`` (engages
    above kExactFrontierScanCap=32768 frontier occurrences — hub items with
    tens of thousands of users, the at-scale Zipf shape)."""

    @pytest.fixture(scope="class")
    def hub_csrs(self):
        # a hub item connected to EVERY user (degree 50k) + per-user extras:
        # any frontier containing the hub crosses the exact-scan cap
        n_u, n_i = 50_000, 64
        rng = np.random.default_rng(0)
        eu = np.repeat(np.arange(n_u, dtype=np.int64), 2)
        ei = np.empty(2 * n_u, np.int64)
        ei[0::2] = 0  # the hub
        ei[1::2] = rng.integers(1, n_i, n_u)
        return (
            HostCSR.from_edges(eu, ei, n_u, n_i),
            HostCSR.from_edges(ei, eu, n_i, n_u),
            set(zip(eu.tolist(), ei.tolist())),
            n_u, n_i,
        )

    def test_edges_valid_and_frontier_bounded(self, hub_csrs):
        ucsr, icsr, real, n_u, n_i = hub_csrs
        seeds = np.arange(16)
        cap = 8
        src, dst, off = native.nhop_sample(
            ucsr.row_ptr, ucsr.cols, icsr.row_ptr, icsr.cols,
            n_u, n_i, seeds, 3, cap, 7,
        )
        assert off[-1] == len(src) and len(src) > 0
        for i, seed in enumerate(seeds):
            s_sl = src[off[i]: off[i + 1]]
            d_sl = dst[off[i]: off[i + 1]]
            # real edges only, seed's own excluded
            for s, d in zip(s_sl.tolist(), d_sl.tolist()):
                assert (s, d) in real
                assert s != int(seed)
            # hop sources are distinct users, ≤ cap per hop, never revisited
            hop_users = np.unique(s_sl)
            counts = {}
            for s in s_sl.tolist():
                counts[s] = counts.get(s, 0) + 1
            # each frontier user contributes its full (2-edge) adjacency once
            assert all(c <= 2 for c in counts.values())
            assert len(hop_users) <= cap * 3  # ≤ cap new users per deep hop

    def test_deterministic_given_seed(self, hub_csrs):
        ucsr, icsr, _, n_u, n_i = hub_csrs
        seeds = np.arange(8)
        a = native.nhop_sample(
            ucsr.row_ptr, ucsr.cols, icsr.row_ptr, icsr.cols,
            n_u, n_i, seeds, 2, 8, 99,
        )
        b = native.nhop_sample(
            ucsr.row_ptr, ucsr.cols, icsr.row_ptr, icsr.cols,
            n_u, n_i, seeds, 2, 8, 99,
        )
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])

    def test_underfill_falls_back_to_exact_scan(self):
        """When rejection's attempt cap under-fills a hop (unseen users are
        a tiny fraction of a huge occurrence total), the exact-scan fallback
        must top the frontier up to num_neighbors instead of silently
        shrinking it.

        Shape: 820 users × 40 articles, every article connected to every
        user. Hop-1 frontier = 40 articles → 32,800 occurrences (> the 32,768
        exact-scan cap) over only 819 unseen users, so rejection's acceptance
        rate is ~2.5% and its 24·40+64 = 1,064 attempts accept ~26 users —
        without the fallback the hop would be under-filled with overwhelming
        probability; with it the hop must hold exactly num_neighbors users.
        """
        n_u, n_i, fanout = 820, 40, 40
        eu = np.repeat(np.arange(n_u, dtype=np.int64), n_i)
        ei = np.tile(np.arange(n_i, dtype=np.int64), n_u)
        ucsr = HostCSR.from_edges(eu, ei, n_u, n_i)
        icsr = HostCSR.from_edges(ei, eu, n_i, n_u)
        for rng_seed in (0, 7, 123):
            src, dst, off = native.nhop_sample(
                ucsr.row_ptr, ucsr.cols, icsr.row_ptr, icsr.cols,
                n_u, n_i, np.array([0]), 2, fanout, rng_seed,
            )
            hop1_users = np.unique(src[off[0]: off[1]])
            assert len(hop1_users) == fanout, (
                f"under-filled frontier: {len(hop1_users)} < {fanout}"
            )
            assert 0 not in hop1_users  # the seed is never revisited

    def test_full_assembly_on_hub_graph(self, hub_csrs):
        """The whole native batch assembly stays consistent on the hub
        shape (slot maps valid, labels reference real slots)."""
        ucsr, icsr, _, n_u, n_i = hub_csrs
        cfg = Config(
            batch_size=16, num_neighbors=8, n_hop_neighbors=2, k=4,
            candidate_pool_size=6, hidden_layer_size=8,
            encoder_layer_output_size=8,
        )
        s = SubgraphSampler(cfg, ucsr, icsr, train=True, seed=1)
        assert s._native is not None
        b = s.sample_batch(np.arange(16))
        ids = np.asarray(b.item_ids)
        mask = np.asarray(b.item_mask)
        # every labeled item resolves to the right global id slot
        lm = np.asarray(b.label_mask)
        ld = np.asarray(b.label_dst)
        lg = np.asarray(b.label_item_global)
        np.testing.assert_array_equal(ids[ld[lm]], lg[lm])
        # edges only touch live slots
        em = np.asarray(b.edge_mask)
        assert mask[np.asarray(b.edge_dst)[em]].all()
