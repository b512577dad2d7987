"""Behavioral port of the reference's per-user subgraph sampler — BASELINE ONLY.

This file exists so ``bench_sampler.py`` can report an HONEST ``vs_baseline``:
the reference's sampling hot loop is ``GraphDataset.__getitem__``
(``/root/reference/data/dataset.py:39-182``), pure torch + Python dicts/sets,
one call per user in DataLoader workers. torch_geometric is not installed in
this image, but that path never needs it beyond the ``HeteroData`` container —
so this port reproduces the algorithm step for step in plain torch and returns
a dict where the reference returns ``HeteroData`` (same tensor contents; the
container swap if anything *flatters* the baseline, since HeteroData does more
bookkeeping per item).

Semantics reproduced (reference line refs):
* positive sampling: ``max(1, floor(|pos| · positive_edges_ratio))`` uniform
  draws with replacement (``dataset.py:49-73``),
* negative ratio fallback ``k − 1`` when ≤1 positive sampled (``:74-78``),
* train negatives: uniform ids in [0, max_article_id) with the
  "graph/neg > 100 → skip the positive filter" fast path, else the
  count-one filter over arange ∪ positives (``:190-230``),
* eval negatives: matcher candidates XOR positives via the count-one trick
  (``:93-106``),
* BFS n-hop with per-hop ``num_neighbors`` fanout via ``random.sample``,
  user dedup through an explored-set, hop-0 direct edges excluded from the
  accumulator (``:258-293``),
* node buckets = sorted unique touched ids, features gathered for them,
  edges remapped local via ``t.bucketize`` (``:133-141,233-241``),
* output: forward + reverse edge_index / edge_label_index / 0-1 labels
  (``:163-182``).

NOT production code — the TPU framework's sampler is
``laplace_gnn_recommendation_tpu/data/sampler.py``.
"""
from __future__ import annotations

import math
import random
from typing import Dict, List, Optional

import torch as t


def _user_edges(user_id: int, article_ids) -> t.Tensor:
    """[2, n] edges (user_id → each article)."""
    tgt = t.as_tensor(article_ids, dtype=t.long)
    src = t.full((len(tgt),), user_id, dtype=t.long)
    return t.stack([src, tgt])


def _count_one(x: t.Tensor) -> t.Tensor:
    uniq, counts = x.unique(return_counts=True)
    return uniq[counts == 1]


def _negative_random(
    positives: t.Tensor, num_edges: int, max_article_id: int, num_neg: int
) -> t.Tensor:
    if num_edges / max(num_neg, 1) > 100:
        # cheap path: collision with a positive is unlikely, skip the filter
        return t.randint(low=0, high=max_article_id, size=(num_neg,))
    pool = _count_one(
        t.cat([t.arange(0, max_article_id + 1, dtype=t.long), positives])
    )
    perm = t.randperm(pool.nelement())
    return pool[perm][:num_neg]


def _bfs_n_hop(
    n: int,
    user_id: int,
    users: Dict[int, list],
    articles: Dict[int, list],
    num_neighbors: int,
) -> t.Tensor:
    acc = t.tensor([[], []], dtype=t.long)
    explored: set = set()
    queue = {user_id}
    for hop in range(n):
        hop_pairs = [(u, users[u]) for u in queue]
        explored |= queue
        if not hop_pairs:
            break
        new_articles: List[int] = []
        hop_edges = []
        for u, arts in hop_pairs:
            new_articles.extend(arts)
            hop_edges.append(_user_edges(u, arts))
        if hop != 0:  # direct user edges are excluded (dataset.py:278-280)
            acc = t.cat([acc, t.cat(hop_edges, dim=1)], dim=1)
        if len(new_articles) > num_neighbors:
            frontier_articles = random.sample(new_articles, num_neighbors)
        else:
            frontier_articles = new_articles
        new_users = (
            set(u for a in frontier_articles for u in articles[a]) - explored
        )
        new_users = list(new_users)
        if len(new_users) > num_neighbors:
            new_users = random.sample(new_users, num_neighbors)
        queue = set(new_users)
    return acc


class ReferencePortDataset:
    """Per-user sampling dataset with the reference's exact algorithm."""

    def __init__(
        self,
        users: Dict[int, list],         # user → purchased article ids
        articles: Dict[int, list],      # article → purchasing user ids
        all_edges: t.Tensor,            # [2, E] full interaction edge index
        user_features: t.Tensor,        # [U, Fu]
        article_features: t.Tensor,     # [I, Fi]
        *,
        k: int = 12,
        positive_edges_ratio: float = 0.5,
        negative_edges_ratio: float = 3.0,
        n_hop_neighbors: int = 3,
        num_neighbors: int = 64,
        train: bool = True,
        matchers: Optional[list] = None,
    ):
        self.users = users
        self.articles = articles
        self.all_edges = all_edges
        self.user_features = user_features
        self.article_features = article_features
        self.k = k
        self.positive_edges_ratio = positive_edges_ratio
        self.negative_edges_ratio = negative_edges_ratio
        self.n_hop_neighbors = n_hop_neighbors
        self.num_neighbors = num_neighbors
        self.train = train
        self.matchers = matchers

    def __len__(self) -> int:
        return len(self.users)

    def __getitem__(self, idx: int) -> dict:
        positives = t.as_tensor(self.users[idx], dtype=t.long)
        pos_edges = _user_edges(idx, positives)

        samp_cut = max(1, math.floor(len(positives) * self.positive_edges_ratio))
        draw = t.randint(low=0, high=len(positives), size=(samp_cut,))
        sampled_pos = positives[draw]
        sampled_pos_edges = _user_edges(idx, sampled_pos)

        n_pos = sampled_pos.shape[0]
        neg_ratio = (self.k - 1) if n_pos <= 1 else self.negative_edges_ratio

        if self.train:
            max_article_id = int(self.all_edges[1].max())
            negs = _negative_random(
                sampled_pos,
                int(self.all_edges.shape[1]),
                max_article_id,
                int(neg_ratio * n_pos),
            )
        else:
            assert self.matchers is not None
            cands = t.cat(
                [t.as_tensor(m.get_matches(idx), dtype=t.long) for m in self.matchers]
            ).unique()
            negs = _count_one(t.cat([cands, positives]))
        neg_edges = _user_edges(idx, negs)

        hop_edges = _bfs_n_hop(
            self.n_hop_neighbors, idx, self.users, self.articles,
            self.num_neighbors,
        )

        touched = t.cat([pos_edges, neg_edges, hop_edges], dim=1)
        subgraph_edges = t.cat([pos_edges, hop_edges], dim=1)

        user_buckets = t.unique(touched[0], sorted=True)
        article_buckets = t.unique(touched[1], sorted=True)
        user_x = self.user_features[user_buckets]
        article_x = self.article_features[article_buckets]

        def remap(e: t.Tensor) -> t.Tensor:
            return t.stack(
                [
                    t.bucketize(e[0], user_buckets),
                    t.bucketize(e[1], article_buckets),
                ]
            )

        sub_local = remap(subgraph_edges)
        label_local = remap(t.cat([sampled_pos_edges, neg_edges], dim=1))
        labels = t.cat(
            [t.ones(sampled_pos_edges.shape[1]), t.zeros(neg_edges.shape[1])]
        ).long()

        rev = t.LongTensor([1, 0])
        return {
            "user_x": user_x,
            "article_x": article_x,
            "edge_index": sub_local,
            "edge_label_index": label_local,
            "edge_label": labels,
            "rev_edge_index": sub_local[rev],
            "rev_edge_label_index": label_local[rev],
            "rev_edge_label": labels,
        }
