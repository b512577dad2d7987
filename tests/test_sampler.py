"""Golden-subgraph oracle tests for the padded N-hop sampler.

Mirrors the reference's sampler-integrity strategy
(``tests/test_dataset.py:25-93`` + ``tests/data_generator.py:40-110``): an
independent second implementation computes the expected subgraph for the
deterministic sampling mode (positives = argmin/argmax item, negative =
globally-last item — reference ``data/dataset.py:61-67,206-207,227-228``)
and every field of the padded batch is checked against it.
"""
import numpy as np
import pytest

from laplace_gnn_recommendation_tpu.configs import Config
from laplace_gnn_recommendation_tpu.constants import EDGE_KEY
from laplace_gnn_recommendation_tpu.data.graph import HostCSR
from laplace_gnn_recommendation_tpu.data.matchers import (
    PopularItemsMatcher,
    UsersWithCommonItemsMatcher,
)
from laplace_gnn_recommendation_tpu.data.sampler import SubgraphSampler, derive_budgets
from laplace_gnn_recommendation_tpu.data.synthetic import manual_dummy_graph

# manual graph: user 0 → {0,1,2}, user 1 → {2,3,4}, user 2 → {4,5}
ADJ = {0: [0, 1, 2], 1: [2, 3, 4], 2: [4, 5]}
REV = {0: [0], 1: [0], 2: [0, 1], 3: [1], 4: [1, 2], 5: [2]}


def make_cfg(**kw):
    defaults = dict(
        batch_size=1, num_neighbors=64, n_hop_neighbors=3,
        positive_edges_ratio=0.5, negative_edges_ratio=3.0, k=12,
        candidate_pool_size=20,
    )
    defaults.update(kw)
    return Config(**defaults)


def oracle_subgraph_edges(seed_user: int, n_hop: int):
    """Independent BFS: seed's own edges + hop-user edges (full fanout)."""
    explored = {seed_user}
    queue = {seed_user}
    edges = set()
    for hop in range(n_hop):
        if not queue:
            break
        new_articles = []
        for u in sorted(queue):
            for a in ADJ[u]:
                new_articles.append(a)
                if hop != 0:
                    edges.add((u, a))
        next_users = set()
        for a in new_articles:
            next_users.update(REV[a])
        next_users -= explored
        explored |= queue | next_users
        queue = next_users
    # seed's positives are in the subgraph via positive_article_edges
    for a in ADJ[seed_user]:
        edges.add((seed_user, a))
    return edges


@pytest.fixture(scope="module")
def graph():
    g = manual_dummy_graph()
    eu, ei = g.edges[EDGE_KEY]
    user_csr = HostCSR.from_edges(eu, ei, 3, 6)
    item_csr = HostCSR.from_edges(ei, eu, 6, 3)
    return g, user_csr, item_csr


class TestDeterministicOracle:
    def test_train_batch_matches_oracle(self, graph):
        _, user_csr, item_csr = graph
        cfg = make_cfg()
        s = SubgraphSampler(cfg, user_csr, item_csr, train=True, randomization=False)
        b = s.sample_batch(np.array([0]))

        # --- label edges: positives [min, max] = items [0, 2], negative = 5
        lm = np.asarray(b.label_mask[0])
        items = np.asarray(b.label_item_global[0])[lm]
        labels = np.asarray(b.label[0])[lm]
        np.testing.assert_array_equal(items, [0, 2, 5])
        np.testing.assert_array_equal(labels, [1, 1, 0])
        # label src slots all map to user 0
        srcs = np.asarray(b.label_src[0])[lm]
        assert all(np.asarray(b.user_ids)[srcs] == 0)
        # label dst slots map to the same items globally
        dsts = np.asarray(b.label_dst[0])[lm]
        np.testing.assert_array_equal(np.asarray(b.item_ids)[dsts], items)

        # --- subgraph edges equal the oracle BFS edge set
        em = np.asarray(b.edge_mask)
        got = {
            (int(np.asarray(b.user_ids)[s_]), int(np.asarray(b.item_ids)[d_]))
            for s_, d_ in zip(np.asarray(b.edge_src)[em], np.asarray(b.edge_dst)[em])
        }
        assert got == oracle_subgraph_edges(0, 3)

        # --- ground truth = user 0's positives
        gt = np.asarray(b.gt_items[0])[: int(b.gt_count[0])]
        np.testing.assert_array_equal(sorted(gt), [0, 1, 2])

    def test_one_hop_has_only_direct_edges(self, graph):
        _, user_csr, item_csr = graph
        cfg = make_cfg(n_hop_neighbors=1)
        s = SubgraphSampler(cfg, user_csr, item_csr, train=True, randomization=False)
        b = s.sample_batch(np.array([1]))
        em = np.asarray(b.edge_mask)
        got = {
            (int(np.asarray(b.user_ids)[s_]), int(np.asarray(b.item_ids)[d_]))
            for s_, d_ in zip(np.asarray(b.edge_src)[em], np.asarray(b.edge_dst)[em])
        }
        assert got == {(1, 2), (1, 3), (1, 4)}

    def test_eval_candidates_xor_positives(self, graph):
        """Eval label set = matcher candidates XOR positives (the count==1
        trick of data/dataset.py:101-106), positives labeled 1 for the
        sampled pair."""
        _, user_csr, item_csr = graph
        cfg = make_cfg()
        matcher = PopularItemsMatcher(3, np.array([0, 3, 5]))
        s = SubgraphSampler(
            cfg, user_csr, item_csr, train=False, matchers=[matcher],
            randomization=False,
        )
        b = s.sample_batch(np.array([0]))
        lm = np.asarray(b.label_mask[0])
        items = np.asarray(b.label_item_global[0])[lm]
        labels = np.asarray(b.label[0])[lm]
        # sampled positives [0, 2]; candidates {0,3,5} xor positives {0,1,2}
        # = {3,5,1,2}
        np.testing.assert_array_equal(items[:2], [0, 2])
        np.testing.assert_array_equal(labels[:2], [1, 1])
        assert set(items[2:]) == {1, 2, 3, 5}
        assert all(labels[2:] == 0)


class TestBatching:
    def test_multi_user_batch_slots_consistent(self, graph):
        _, user_csr, item_csr = graph
        cfg = make_cfg(batch_size=3)
        s = SubgraphSampler(cfg, user_csr, item_csr, train=True, randomization=False)
        b = s.sample_batch(np.array([0, 1, 2]))
        # every masked edge's endpoints must be valid slots
        em = np.asarray(b.edge_mask)
        assert np.asarray(b.user_mask)[np.asarray(b.edge_src)[em]].all()
        assert np.asarray(b.item_mask)[np.asarray(b.edge_dst)[em]].all()
        # seed slots round-trip
        for row in range(3):
            assert int(np.asarray(b.user_ids)[int(b.seed_slots[row])]) == row

    def test_epoch_batches_cover_users_and_pad(self, graph):
        _, user_csr, item_csr = graph
        cfg = make_cfg(batch_size=2)
        s = SubgraphSampler(cfg, user_csr, item_csr, train=True, randomization=False)
        batches = list(s.epoch_batches(shuffle=False))
        assert len(batches) == 2
        # second batch has one valid row (3 users, batch=2)
        assert bool(np.asarray(batches[1].label_mask)[1].any()) is False
        assert int(batches[1].gt_count[1]) == 0

    def test_no_truncation_on_tiny_graph(self, graph):
        _, user_csr, item_csr = graph
        cfg = make_cfg(batch_size=3)
        s = SubgraphSampler(cfg, user_csr, item_csr, train=True, randomization=False)
        s.sample_batch(np.array([0, 1, 2]))
        assert all(v == 0 for v in s.truncations.values())

    def test_random_mode_valid(self, graph):
        _, user_csr, item_csr = graph
        cfg = make_cfg(batch_size=3)
        s = SubgraphSampler(cfg, user_csr, item_csr, train=True, seed=5)
        b = s.sample_batch(np.array([0, 1, 2]))
        lm = np.asarray(b.label_mask)
        labels = np.asarray(b.label)
        items = np.asarray(b.label_item_global)
        for row, u in enumerate([0, 1, 2]):
            pos_items = items[row][lm[row] & (labels[row] == 1)]
            assert set(pos_items) <= set(ADJ[u])  # sampled positives are real


class TestMatchers:
    def test_common_items_matcher(self, graph):
        _, user_csr, item_csr = graph
        m = UsersWithCommonItemsMatcher(50, user_csr, item_csr)
        got = m.get_matches(2)
        # user 2 buys {4,5}; users sharing: item4→{1,2}, item5→{2};
        # candidates = items of [1,2,2] in order = [2,3,4, 4,5, 4,5]
        np.testing.assert_array_equal(got, [2, 3, 4, 4, 5, 4, 5])


class TestTruncation:
    def test_truncated_nodes_invalidate_labels(self, graph):
        """With node budgets forced tiny, labels whose endpoints were
        dropped must be masked out — never remapped to wrong slots."""
        from laplace_gnn_recommendation_tpu.data.sampler import SamplerBudgets

        _, user_csr, item_csr = graph
        cfg = make_cfg(batch_size=3)
        budgets = SamplerBudgets(
            num_user_slots=2, num_item_slots=3, num_edges=16,
            labels_per_user=8, gt_per_user=6,
        )
        s = SubgraphSampler(
            cfg, user_csr, item_csr, train=True, randomization=False,
            budgets=budgets,
        )
        b = s.sample_batch(np.array([0, 1, 2]))
        assert s.truncations["nodes"] > 0
        lm = np.asarray(b.label_mask)
        # every surviving label edge maps to real, in-set endpoints
        uids = np.asarray(b.user_ids)
        iids = np.asarray(b.item_ids)
        umask = np.asarray(b.user_mask)
        imask = np.asarray(b.item_mask)
        for row in range(3):
            for col in np.flatnonzero(lm[row]):
                sslot = int(np.asarray(b.label_src)[row, col])
                dslot = int(np.asarray(b.label_dst)[row, col])
                assert umask[sslot] and imask[dslot]
                # a positive label's item must be the item it claims to be
                assert iids[dslot] == int(np.asarray(b.label_item_global)[row, col])
        # rows whose seed user fell outside the truncated user set are
        # fully masked (gt_count 0 and no labels)
        kept_users = set(uids[umask].tolist())
        for row, u in enumerate([0, 1, 2]):
            if u not in kept_users:
                assert not lm[row].any()
                assert int(np.asarray(b.gt_count)[row]) == 0
