"""PinSAGE data layer: random-walk importance sampling → padded blocks.

TPU-native replacement for the reference's DGL-based sampler stack
(``pinsage/sampler.py:16-186``) and dataset builder (``pinsage/builder.py``,
``pinsage/process_hm.py``):

* :class:`ItemToItemBatchSampler` — (head, tail, neg_tail) item triples where
  the tail comes from an item→user→item random walk (``sampler.py:25-40``);
  walks that die (item with no users) are masked out,
* random-walk importance neighborhoods: per seed item, ``num_random_walks``
  restart-probability walks; the ``num_neighbors`` most-visited items become
  the seed's frontier with visit counts as edge weights (the
  ``dgl.sampling.PinSAGESampler`` semantics, ``sampler.py:60-71``),
* leak prevention: frontier edges connecting a batch's (head, tail) or
  (head, neg_tail) pairs are dropped (``sampler.py:77-87``),
* block compaction (``compact_and_copy``/``to_block``) becomes fixed-shape
  index-remapped :class:`PinSAGEBlock` pytrees.

Everything here is host-side numpy; the blocks upload as static-shape device
arrays.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import EDGE_KEY
from .etl import LinkPredArtifacts
from .graph import HostCSR


@dataclass
class PinSAGEBlock:
    """One message-flow block: src item slots → dst item slots (jittable)."""

    src_ids: jnp.ndarray    # int32 [S] global item ids (pad → 0)
    dst_ids: jnp.ndarray    # int32 [D] global item ids
    src_mask: jnp.ndarray   # bool [S]
    dst_mask: jnp.ndarray   # bool [D]
    edge_src: jnp.ndarray   # int32 [E] local src slot
    edge_dst: jnp.ndarray   # int32 [E] local dst slot
    edge_w: jnp.ndarray     # float32 [E] visit counts (0 on pads)


jax.tree_util.register_dataclass(
    PinSAGEBlock,
    data_fields=tuple(f.name for f in dataclasses.fields(PinSAGEBlock)),
    meta_fields=(),
)


@dataclass
class PinSAGEBatch:
    """Blocks + compacted pos/neg pair graphs (jittable)."""

    blocks: List[PinSAGEBlock]
    pos_head: jnp.ndarray   # int32 [P] slot into blocks[-1].dst
    pos_tail: jnp.ndarray
    neg_head: jnp.ndarray
    neg_tail: jnp.ndarray
    pair_mask: jnp.ndarray  # bool [P]


jax.tree_util.register_dataclass(
    PinSAGEBatch,
    data_fields=tuple(f.name for f in dataclasses.fields(PinSAGEBatch)),
    meta_fields=(),
)


@dataclass
class PinSAGEData:
    """Dataset bundle — the ``pinsage_dataset.pkl`` equivalent
    (``pinsage/process_hm.py:9-57``)."""

    num_users: int
    num_items: int
    user_csr: HostCSR       # train user→items
    item_csr: HostCSR       # train item→users
    item_features: np.ndarray           # int32 [I, F] categorical
    item_features_float: Optional[np.ndarray]  # float32 [I, D] or None
    latest_item_per_user: np.ndarray    # int32 [U] last train interaction
    val_items: List[np.ndarray]         # per-user val ground truth
    test_items: List[np.ndarray]


def build_pinsage_data(a: LinkPredArtifacts) -> PinSAGEData:
    """From preprocessed artifacts (chronological edge order) — replaces
    ``process_hm.py``'s pickle with train CSRs + latest-interaction index +
    per-user val/test item sets."""
    g = a.graph
    eu, ei = g.edges[EDGE_KEY]
    eu = np.asarray(eu, np.int64)
    ei = np.asarray(ei, np.int64)
    num_users = g.num_nodes[EDGE_KEY.src]
    num_items = g.num_nodes[EDGE_KEY.dst]
    tr = a.train_mask

    # last train interaction per user, in chronological order; users with
    # no train history keep -1 and are excluded from latest-item retrieval
    # eval (the reference asserts every user has one, evaluation.py:39)
    latest = np.full(num_users, -1, np.int32)
    for u, i in zip(eu[tr], ei[tr]):
        latest[u] = i

    def per_user(mask):
        out = [np.empty(0, np.int64) for _ in range(num_users)]
        for u in np.unique(eu[mask]):
            out[int(u)] = ei[mask][eu[mask] == u]
        return out

    ff = g.node_features_float.get(EDGE_KEY.dst)
    return PinSAGEData(
        num_users=num_users,
        num_items=num_items,
        user_csr=HostCSR.from_edges(eu[tr], ei[tr], num_users, num_items),
        item_csr=HostCSR.from_edges(ei[tr], eu[tr], num_items, num_users),
        item_features=g.node_features[EDGE_KEY.dst].astype(np.int32),
        item_features_float=ff.astype(np.float32) if ff is not None else None,
        latest_item_per_user=latest,
        val_items=per_user(a.val_mask),
        test_items=per_user(a.test_mask),
    )


class PinSAGESampler:
    """Random-walk importance neighborhoods + block assembly."""

    def __init__(
        self,
        data: PinSAGEData,
        random_walk_length: int = 2,
        random_walk_restart_prob: float = 0.5,
        num_random_walks: int = 10,
        num_neighbors: int = 3,
        num_layers: int = 2,
        batch_size: int = 32,
        seed: int = 0,
        use_native: bool = True,
    ):
        self.d = data
        from .. import native as _native

        self._native = _native if (use_native and _native.LIB is not None) else None
        self.walk_length = random_walk_length
        self.restart_prob = random_walk_restart_prob
        self.num_walks = num_random_walks
        self.num_neighbors = num_neighbors
        self.num_layers = num_layers
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        # persistent id→slot array (stamp-free: each batch/layer only looks
        # up ids it has just written, so stale entries are never read —
        # replaces the per-batch {id: slot} dicts, which were the assembly
        # hot spot at production batch sizes)
        self._slot = np.zeros(data.num_items, np.int32)
        # static slot budgets per layer (innermost → outermost)
        self.dst_budget = []
        self.src_budget = []
        n = 3 * batch_size  # compacted heads+tails+negs upper bound
        for _ in range(num_layers):
            self.dst_budget.append(n)
            n = n * (1 + num_neighbors)
            self.src_budget.append(n)

    # -- random walks ------------------------------------------------------

    def _walk_step(self, items: np.ndarray) -> np.ndarray:
        """One item→user→item metapath traversal; dead ends return -1."""
        if self._native is not None:
            return self._native.walk_step(
                self.d.user_csr.row_ptr, self.d.user_csr.cols,
                self.d.item_csr.row_ptr, self.d.item_csr.cols,
                items, int(self.rng.integers(0, 2 ** 62)),
            )
        out = np.full(len(items), -1, np.int64)
        for idx, it in enumerate(items):
            if it < 0:
                continue
            users = self.d.item_csr.neighbors(int(it))
            if len(users) == 0:
                continue
            u = users[self.rng.integers(len(users))]
            its = self.d.user_csr.neighbors(int(u))
            if len(its) == 0:
                continue
            out[idx] = its[self.rng.integers(len(its))]
        return out

    def neighbor_frontier(
        self, seeds: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Top-``num_neighbors`` visited items per seed with visit counts —
        the PinSAGESampler contract (edges neighbor→seed, weight=count)."""
        if self._native is not None:
            return self._native.pinsage_frontier(
                self.d.user_csr.row_ptr, self.d.user_csr.cols,
                self.d.item_csr.row_ptr, self.d.item_csr.cols,
                np.asarray(seeds, np.int32),
                self.walk_length, self.restart_prob,
                self.num_walks, self.num_neighbors,
                int(self.rng.integers(0, 2 ** 62)),
            )
        n = len(seeds)
        counts: List[Dict[int, int]] = [dict() for _ in range(n)]
        for _ in range(self.num_walks):
            cur = seeds.astype(np.int64).copy()
            for _step in range(self.walk_length):
                cur = self._walk_step(cur)
                for idx, it in enumerate(cur):
                    if it >= 0:
                        counts[idx][int(it)] = counts[idx].get(int(it), 0) + 1
                # restart-to-seed with probability restart_prob
                restart = self.rng.random(n) < self.restart_prob
                cur = np.where(restart | (cur < 0), seeds, cur)
        srcs, dsts, ws = [], [], []
        for idx, c in enumerate(counts):
            c.pop(int(seeds[idx]), None)  # self-visits are not neighbors
            top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[: self.num_neighbors]
            for it, w in top:
                srcs.append(it)
                dsts.append(int(seeds[idx]))
                ws.append(float(w))
        return (
            np.array(srcs, np.int64),
            np.array(dsts, np.int64),
            np.array(ws, np.float32),
        )

    # -- batch sampling ----------------------------------------------------

    def sample_item_triples(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(heads, tails, neg_tails) — ``ItemToItemBatchSampler``
        (``pinsage/sampler.py:25-40``)."""
        heads = self.rng.integers(0, self.d.num_items, self.batch_size)
        tails = self._walk_step(heads.astype(np.int64))
        neg_tails = self.rng.integers(0, self.d.num_items, self.batch_size)
        mask = tails >= 0
        return heads[mask], tails[mask], neg_tails[mask]

    def sample_blocks(
        self,
        seeds: np.ndarray,
        forbidden_pairs: Optional[set] = None,
    ) -> Tuple[List[PinSAGEBlock], np.ndarray]:
        """L compacted blocks, outermost first (``sample_blocks``,
        ``pinsage/sampler.py:73-91``). Returns (blocks, final_dst_ids)."""
        blocks_rev: List[PinSAGEBlock] = []
        seeds = np.asarray(seeds, np.int64)
        d_b0 = self.dst_budget[0]
        assert len(seeds) <= d_b0, (len(seeds), d_b0)
        # padded slot layout threaded through layers: the src layout of the
        # inner block IS the dst layout of the next (outer) block, so the
        # model's static prefix slice h[:dst_budget] stays aligned.
        cur_ids = np.zeros(d_b0, np.int64)
        cur_ids[: len(seeds)] = seeds
        cur_mask = np.arange(d_b0) < len(seeds)

        # key-encoded forbidden pairs for a vectorized isin filter
        ni = self.d.num_items
        fkeys = (
            np.fromiter(
                (int(s) * ni + int(d) for s, d in forbidden_pairs),
                np.int64,
                count=len(forbidden_pairs),
            )
            if forbidden_pairs
            else None
        )

        for layer in range(self.num_layers):
            valid = cur_ids[cur_mask]
            fs, fd, fw = self.neighbor_frontier(valid)
            if fkeys is not None and len(fs):
                keep = ~np.isin(fs * ni + fd, fkeys)
                fs, fd, fw = fs[keep], fd[keep], fw[keep]
            extra = np.setdiff1d(np.unique(fs), valid)
            s_b, d_b = self.src_budget[layer], self.dst_budget[layer]
            assert d_b == len(cur_ids) and d_b + len(extra) <= s_b

            # vectorized slot map: write this layer's ids, look up only them
            self._slot[cur_ids[cur_mask]] = np.flatnonzero(cur_mask).astype(
                np.int32
            )
            self._slot[extra] = (d_b + np.arange(len(extra))).astype(np.int32)

            src_ids = np.zeros(s_b, np.int64)
            src_ids[:d_b] = cur_ids
            src_ids[d_b : d_b + len(extra)] = extra
            src_mask = np.zeros(s_b, bool)
            src_mask[:d_b] = cur_mask
            src_mask[d_b : d_b + len(extra)] = True

            e_b = d_b * self.num_neighbors
            e = len(fs)
            edge_src = np.zeros(e_b, np.int32)
            edge_dst = np.zeros(e_b, np.int32)
            edge_w = np.zeros(e_b, np.float32)
            edge_src[:e] = self._slot[fs]
            edge_dst[:e] = self._slot[fd]
            edge_w[:e] = fw
            # numpy leaves: upload happens at the jit boundary (eager
            # device puts serialize the sampling thread on remote tunnels)
            blocks_rev.append(
                PinSAGEBlock(
                    src_ids=src_ids.astype(np.int32),
                    dst_ids=cur_ids.astype(np.int32).copy(),
                    src_mask=src_mask,
                    dst_mask=cur_mask.copy(),
                    edge_src=edge_src,
                    edge_dst=edge_dst,
                    edge_w=edge_w,
                )
            )
            cur_ids, cur_mask = src_ids, src_mask
        blocks = list(reversed(blocks_rev))  # outermost first, like DGL
        return blocks, np.asarray(blocks_rev[0].dst_ids)

    def sample_train_batch(self) -> Optional[PinSAGEBatch]:
        """(pos_graph, neg_graph, blocks) — ``sample_from_item_pairs``
        (``pinsage/sampler.py:93-106``)."""
        heads, tails, neg_tails = self.sample_item_triples()
        if len(heads) == 0:
            return None
        seeds = np.unique(np.concatenate([heads, tails, neg_tails]))
        forbidden = set(
            [(int(t), int(h)) for h, t in zip(heads, tails)]
            + [(int(t), int(h)) for h, t in zip(heads, neg_tails)]
            + [(int(h), int(t)) for h, t in zip(heads, tails)]
            + [(int(h), int(t)) for h, t in zip(heads, neg_tails)]
        )
        blocks, _ = self.sample_blocks(seeds, forbidden_pairs=forbidden)
        # stamped slot array again (seeds were the innermost dst layout)
        self._slot[seeds] = np.arange(len(seeds), dtype=np.int32)
        p = self.batch_size
        n = len(heads)
        pos_head = np.zeros(p, np.int32)
        pos_tail = np.zeros(p, np.int32)
        neg_head = np.zeros(p, np.int32)
        neg_tail = np.zeros(p, np.int32)
        mask = np.zeros(p, bool)
        pos_head[:n] = self._slot[heads]
        pos_tail[:n] = self._slot[tails]
        neg_head[:n] = self._slot[heads]
        neg_tail[:n] = self._slot[neg_tails]
        mask[:n] = True
        return PinSAGEBatch(
            blocks=blocks,
            pos_head=pos_head,
            pos_tail=pos_tail,
            neg_head=neg_head,
            neg_tail=neg_tail,
            pair_mask=mask,
        )
