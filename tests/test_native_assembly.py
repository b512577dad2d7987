"""Native C++ whole-batch assembly (assemble_train_batch): structural
invariants vs the Python path, budget-overflow fallback, determinism."""
import numpy as np
import pytest

from laplace_gnn_recommendation_tpu import native
from laplace_gnn_recommendation_tpu.configs import Config
from laplace_gnn_recommendation_tpu.data.graph import HostCSR
from laplace_gnn_recommendation_tpu.data.sampler import (
    SamplerBudgets,
    SubgraphSampler,
)
from laplace_gnn_recommendation_tpu.data.synthetic import random_bipartite_edges

pytestmark = pytest.mark.skipif(
    native.LIB is None, reason="native sampler library unavailable"
)


def make_graph(seed=3, num_users=80, num_items=60, avg_degree=7):
    eu, ei = random_bipartite_edges(seed, num_users, num_items, avg_degree)
    return (
        HostCSR.from_edges(eu, ei, num_users, num_items),
        HostCSR.from_edges(ei, eu, num_items, num_users),
    )


def make_sampler(ucsr, icsr, **cfg_kw):
    defaults = dict(
        batch_size=8, num_neighbors=8, n_hop_neighbors=2, k=6,
        positive_edges_ratio=0.5, negative_edges_ratio=2.0,
    )
    defaults.update(cfg_kw)
    return SubgraphSampler(
        Config(**defaults), ucsr, icsr, train=True, seed=7
    )


class TestNativeAssembly:
    def test_batch_invariants(self):
        ucsr, icsr = make_graph()
        s = make_sampler(ucsr, icsr)
        seeds = np.arange(8)
        b = s.sample_batch(seeds)

        uid = np.asarray(b.user_ids)
        iid = np.asarray(b.item_ids)
        um = np.asarray(b.user_mask)
        im = np.asarray(b.item_mask)
        # slots: sorted unique global ids in the masked prefix
        u_valid = uid[um]
        i_valid = iid[im]
        assert (np.diff(u_valid) > 0).all()
        assert (np.diff(i_valid) > 0).all()

        # every masked edge is a real adjacency pair on valid slots
        em = np.asarray(b.edge_mask)
        es = np.asarray(b.edge_src)[em]
        ed = np.asarray(b.edge_dst)[em]
        assert es.max(initial=0) < um.sum()
        assert ed.max(initial=0) < im.sum()
        for gu, gi in zip(uid[es], iid[ed]):
            assert gi in ucsr.neighbors(int(gu))

        # labels: 1 ⇔ item is a true positive of the row's seed user
        lm = np.asarray(b.label_mask)
        li = np.asarray(b.label_item_global)
        lab = np.asarray(b.label)
        ls = np.asarray(b.label_src)
        for row, u in enumerate(seeds):
            pos = set(ucsr.neighbors(int(u)))
            for item, l in zip(li[row][lm[row]], lab[row][lm[row]]):
                if l == 1.0:
                    assert item in pos
            # label rows point at the seed's user slot
            assert (ls[row][lm[row]] == np.asarray(b.seed_slots)[row]).all()
            # ground truth = positives
            g = int(np.asarray(b.gt_count)[row])
            np.testing.assert_array_equal(
                np.asarray(b.gt_items)[row, :g],
                ucsr.neighbors(int(u))[:g],
            )

    def test_matches_python_path_shapes_and_nodes(self):
        """Native and Python assembly agree on the node universe for the
        same seeds when positive sampling covers all edges (ratio 1.0 makes
        the positives deterministic as a SET; hop/neg draws still differ by
        RNG, so compare the invariant parts only)."""
        ucsr, icsr = make_graph(avg_degree=4)
        s_nat = make_sampler(ucsr, icsr, n_hop_neighbors=1,
                             positive_edges_ratio=1.0)
        s_py = make_sampler(ucsr, icsr, n_hop_neighbors=1,
                            positive_edges_ratio=1.0)
        s_py._native = None
        seeds = np.arange(6)
        b1 = s_nat.sample_batch(seeds)
        b2 = s_py.sample_batch(seeds)
        # 1-hop: touched users = seeds only; items ⊇ all their positives
        for b in (b1, b2):
            assert np.asarray(b.user_mask).sum() == 6
        pos_union = np.unique(np.concatenate(
            [ucsr.neighbors(int(u)) for u in seeds]
        ))
        for b in (b1, b2):
            iid = np.asarray(b.item_ids)[np.asarray(b.item_mask)]
            assert set(pos_union).issubset(set(iid.tolist()))
        # edge counts agree (positives all included, no hop edges at 1 hop)
        assert (
            np.asarray(b1.edge_mask).sum() == np.asarray(b2.edge_mask).sum()
        )

    def test_budget_overflow_falls_back(self):
        ucsr, icsr = make_graph()
        s = make_sampler(ucsr, icsr)
        # node budget too small for the batch → native returns None → the
        # Python truncating path must produce a batch and count it
        s.budgets = SamplerBudgets(
            num_user_slots=4, num_item_slots=8, num_edges=64,
            labels_per_user=8, gt_per_user=4,
        )
        b = s.sample_batch(np.arange(8))
        assert s.truncations["nodes"] >= 1
        assert np.asarray(b.user_mask).sum() <= 4

    def test_deterministic_given_seed(self):
        ucsr, icsr = make_graph()
        s1 = make_sampler(ucsr, icsr)
        s2 = make_sampler(ucsr, icsr)
        b1 = s1.sample_batch(np.arange(8))
        b2 = s2.sample_batch(np.arange(8))
        np.testing.assert_array_equal(
            np.asarray(b1.label_item_global), np.asarray(b2.label_item_global)
        )
        np.testing.assert_array_equal(
            np.asarray(b1.edge_src), np.asarray(b2.edge_src)
        )

    def test_valid_rows_masks_padding(self):
        ucsr, icsr = make_graph()
        s = make_sampler(ucsr, icsr)
        b = s.sample_batch(np.array([0, 1, 2, 2, 2, 2, 2, 2]), valid_rows=3)
        lm = np.asarray(b.label_mask)
        assert lm[3:].sum() == 0
        assert (np.asarray(b.gt_count)[3:] == 0).all()
        assert lm[:3].sum() > 0


class TestNativeEvalAssembly:
    """Native eval batch (matcher candidates XOR positives in C++) vs the
    Python eval path — deterministic pieces must match exactly."""

    def _setup(self, seed=0, num_users=40, num_items=30):
        from laplace_gnn_recommendation_tpu.configs import Config
        from laplace_gnn_recommendation_tpu.data.graph import HostCSR
        from laplace_gnn_recommendation_tpu.data.matchers import (
            UsersWithCommonItemsMatcher,
        )
        from laplace_gnn_recommendation_tpu.data.sampler import SubgraphSampler
        from laplace_gnn_recommendation_tpu.data.synthetic import (
            random_bipartite_edges,
        )

        eu, ei = random_bipartite_edges(
            seed=seed, num_users=num_users, num_items=num_items, avg_degree=5
        )
        ucsr = HostCSR.from_edges(eu, ei, num_users, num_items)
        icsr = HostCSR.from_edges(ei, eu, num_items, num_users)
        cfg = Config(
            batch_size=8, num_neighbors=100, n_hop_neighbors=2, k=4,
            candidate_pool_size=6,
        )
        matcher = UsersWithCommonItemsMatcher(6, ucsr, icsr)
        mk = lambda native: SubgraphSampler(  # noqa: E731
            cfg, ucsr, icsr, train=False, matchers=[matcher],
            randomization=True, seed=3, use_native=native,
        )
        return mk, ucsr

    def test_eval_negatives_and_gt_match_python(self):
        import numpy as np

        from laplace_gnn_recommendation_tpu import native

        if native.LIB is None:
            import pytest

            pytest.skip("no native lib")
        mk, ucsr = self._setup()
        seeds = np.arange(8)
        b_nat = mk(True).sample_batch(seeds)
        b_py = mk(False).sample_batch(seeds)

        def neg_items(b, row):
            m = np.asarray(b.label_mask)[row]
            lab = np.asarray(b.label)[row]
            items = np.asarray(b.label_item_global)[row]
            return sorted(items[m & (lab == 0)].tolist())

        for row in range(8):
            # negatives = candidates XOR positives: fully deterministic
            assert neg_items(b_nat, row) == neg_items(b_py, row), row
            # sampled positives are random draws but must BE positives
            m = np.asarray(b_nat.label_mask)[row]
            lab = np.asarray(b_nat.label)[row]
            pos = np.asarray(b_nat.label_item_global)[row][m & (lab == 1)]
            true_pos = set(ucsr.neighbors(int(seeds[row])).tolist())
            assert set(pos.tolist()) <= true_pos
        np.testing.assert_array_equal(
            np.asarray(b_nat.gt_items), np.asarray(b_py.gt_items)
        )
        np.testing.assert_array_equal(
            np.asarray(b_nat.gt_count), np.asarray(b_py.gt_count)
        )
        # saturating fanout → identical subgraph edge sets (global pairs)
        def pairs(b):
            m = np.asarray(b.edge_mask)
            u = np.asarray(b.user_ids)[np.asarray(b.edge_src)[m]]
            i = np.asarray(b.item_ids)[np.asarray(b.edge_dst)[m]]
            return sorted(zip(u.tolist(), i.tolist()))

        assert pairs(b_nat) == pairs(b_py)

    def test_common_items_batch_matches_scalar(self):
        import numpy as np

        from laplace_gnn_recommendation_tpu import native

        if native.LIB is None:
            import pytest

            pytest.skip("no native lib")
        mk, ucsr = self._setup(seed=5)
        from laplace_gnn_recommendation_tpu.data.matchers import (
            UsersWithCommonItemsMatcher,
        )
        from laplace_gnn_recommendation_tpu.data.graph import HostCSR

        m = mk(True).matchers[0]
        users = np.arange(10)
        batch = m.get_matches_batch(users)
        for row, u in enumerate(users):
            single = np.asarray(m.get_matches(int(u)), np.int64)
            got = batch[row][batch[row] >= 0]
            np.testing.assert_array_equal(got, single)
