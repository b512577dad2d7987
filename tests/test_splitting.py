"""Chronological and random splitters vs naive oracles (reference
``run_data_splitting.py:20-52``, ``data/lightgcn_loader.py:13-31``)."""
import numpy as np

from laplace_gnn_recommendation_tpu.data.splitting import (
    deduplicate_interactions,
    random_edge_split,
    train_test_split_by_time,
)


def naive_leave_last_2(user_idx):
    """Direct port of the reference groupby semantics."""
    n = len(user_idx)
    train = np.ones(n, bool)
    val = np.zeros(n, bool)
    test = np.zeros(n, bool)
    for u in np.unique(user_idx):
        rows = np.where(user_idx == u)[0]  # already time-ordered
        if len(rows) > 1:
            train[rows[-1]] = False
            test[rows[-1]] = True
        if len(rows) > 2:
            train[rows[-2]] = False
            val[rows[-2]] = True
    return train, val, test


class TestChronologicalSplit:
    def test_matches_naive(self):
        rng = np.random.default_rng(0)
        user_idx = rng.integers(0, 20, 300)
        tr, va, te = train_test_split_by_time(user_idx)
        etr, eva, ete = naive_leave_last_2(user_idx)
        np.testing.assert_array_equal(tr, etr)
        np.testing.assert_array_equal(va, eva)
        np.testing.assert_array_equal(te, ete)

    def test_single_interaction_user_stays_in_train(self):
        tr, va, te = train_test_split_by_time(np.array([7]))
        assert tr[0] and not va[0] and not te[0]

    def test_partition(self):
        rng = np.random.default_rng(1)
        user_idx = rng.integers(0, 50, 500)
        tr, va, te = train_test_split_by_time(user_idx)
        np.testing.assert_array_equal(tr | va | te, np.ones(500, bool))
        assert not np.any(tr & va) and not np.any(tr & te) and not np.any(va & te)


class TestDedup:
    def test_keeps_first(self):
        u = np.array([0, 0, 1, 0, 1])
        i = np.array([3, 3, 2, 3, 2])
        keep = deduplicate_interactions(u, i)
        np.testing.assert_array_equal(keep, [0, 2])


class TestRandomSplit:
    def test_proportions_and_disjoint(self):
        tr, va, te = random_edge_split(1000, seed=1)
        assert len(tr) == 800 and len(va) == 100 and len(te) == 100
        allidx = np.concatenate([tr, va, te])
        assert len(np.unique(allidx)) == 1000

    def test_deterministic(self):
        a = random_edge_split(500, seed=1)
        b = random_edge_split(500, seed=1)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
