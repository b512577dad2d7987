"""Batch serving API — the long-running counterpart of the submission flow.

The reference ships only an offline Kaggle writer (``run_submission.py:78``):
load checkpoint → infer over the test loader → top-k CSV. A production
recommender needs the same two stages as a service; this module wraps them
with persistent compiled steps and fixed batch shapes (one XLA compilation
per server, every request reuses it):

* :class:`RetrievalServer` — embedding-table retrieval (stage 1). Holds the
  user/item embedding tables exported by the LightGCN/PinSAGE pipelines and
  answers ``recommend(user_ids)`` with exclusion-masked top-k MIPS
  (``ops/topk.auto_mips_topk``: XLA materializing path while the scores
  matrix fits, Pallas streaming beyond). Seen-item exclusion mirrors the
  reference's train-item filtering (``utils/metrics_lightgcn.py:132-142``).
* :class:`RankingServer` — candidate re-ranking (stage 2). Matcher
  candidates → padded subgraph batch → hetero SAGE ``infer`` → top-k item
  ids, i.e. the ``run_submission.py:48-69`` flow as a reusable service.

Both chunk arbitrary request sizes into the fixed batch shape, pad the tail,
and mask padded rows out of the results.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .configs import Config
from .data.lightgcn_data import padded_user_items
from .data.sampler import SubgraphSampler
from .models import sage
from .ops.topk import auto_mips_topk


class RetrievalServer:
    """Top-k MIPS retrieval over full device-resident embedding tables."""

    def __init__(
        self,
        user_emb: np.ndarray,           # [U, D]
        item_emb: np.ndarray,           # [I, D]
        k: int = 12,
        exclude_edges: Optional[Tuple[np.ndarray, np.ndarray]] = None,
        batch_size: int = 256,
        quantized: bool = False,
        mesh=None,
    ):
        """``exclude_edges=(edge_user, edge_item)`` marks already-seen items
        that must never be recommended (the train interactions).

        ``quantized=True`` stores the catalog as per-row int8 — 4× less HBM
        capacity AND the measured-fastest retrieval at serving shapes
        (streaming 2048-row tiles: 3.27 ms vs 3.83 for f32 at B=256/105k
        amortized on-device; ~98% top-12 agreement with f32 on gaussian
        embeddings; approximate retrieval). Requires the TPU backend
        (Pallas kernel); the catalog is padded internally to the 2048-row
        tile so any catalog size is servable. With a mesh whose
        ``model`` axis is >1, retrieval runs the distributed MIPS path over
        a row-sharded (internally padded) catalog — quantized and sharded
        are mutually exclusive, sharded wins."""
        from .parallel.mesh import MODEL_AXIS, round_up, row_sharding

        self.user_emb = jnp.asarray(user_emb, jnp.float32)
        item_np = np.asarray(item_emb, np.float32)
        self.num_users, self.dim = self.user_emb.shape
        self.num_items = int(item_np.shape[0])   # TRUE catalog size
        self.k = int(k)
        self.batch_size = int(batch_size)
        self.mesh = mesh
        parts = mesh.shape[MODEL_AXIS] if mesh is not None else 1
        self._sharded = parts > 1
        self.quantized = bool(
            quantized
            and jax.default_backend() == "tpu"
            and not self._sharded
        )

        # internal catalog padding: zero rows, masked out of every top-k
        # (quantized streams in 2048-row tiles — the measured-fastest width)
        mult = 2048 if self.quantized else 1
        mult = mult * parts
        items_padded = round_up(self.num_items, mult)
        if items_padded != self.num_items:
            item_np = np.pad(
                item_np, ((0, items_padded - self.num_items), (0, 0))
            )
        self.items_padded = items_padded
        self.item_emb = jnp.asarray(item_np)
        if self._sharded:
            self.item_emb = jax.device_put(self.item_emb, row_sharding(mesh))

        if self.quantized:
            from .ops.topk_pallas import row_quantize

            self._q_items, self._item_scales = row_quantize(self.item_emb)
        if exclude_edges is not None:
            eu, ei = exclude_edges
            ex, exc = padded_user_items(
                np.arange(self.num_users, dtype=np.int32),
                np.asarray(eu, np.int64), np.asarray(ei),
            )
            self._ex, self._exc = ex, exc
        else:
            self._ex = self._exc = None

        num_items_true = self.num_items
        has_tail = items_padded != num_items_true

        if self._sharded:
            from .ops.topk import sharded_mips_topk

            @partial(jax.jit, static_argnames=("k",))
            def _step(uvec, item_emb, ex, exc, k):
                return sharded_mips_topk(
                    mesh, uvec, item_emb, k, ex, exc,
                    num_valid_items=num_items_true,
                )

            @partial(jax.jit, static_argnames=("k",))
            def _step_plain(uvec, item_emb, k):
                return sharded_mips_topk(
                    mesh, uvec, item_emb, k,
                    num_valid_items=num_items_true,
                )
        elif self.quantized:
            from .ops.topk import mips_topk_int8
            from .ops.topk_pallas import (
                exclusion_mask,
                streaming_mips_topk_int8,
            )

            def _tail_mask(b):
                # pad-tail rows are dead: never recommendable
                return jnp.broadcast_to(
                    (jnp.arange(items_padded) >= num_items_true)
                    .astype(jnp.int8)[None, :],
                    (b, items_padded),
                )

            # streaming int8 at the 2048-row tile is the measured-fastest
            # retrieval at serving shapes AND avoids the [B, I] scores
            # materialization (BENCH_SERVING device_amortized: 3.27 ms vs
            # 3.83 f32-XLA / 4.97 int8-XLA at B=256, I=105k). The
            # materializing int8 path remains for batches past the fold's
            # VMEM limit.
            from .ops.topk import STREAMING_MAX_BATCH

            materialize = self.batch_size > STREAMING_MAX_BATCH
            # pad rows quantize to scale 0 → dequantized score 0, which can
            # outrank negative real scores: mask the tail explicitly
            tail_ex = jnp.arange(num_items_true, items_padded, dtype=jnp.int32)

            # the quantized tables ride as ARGUMENTS, not jit-closure
            # constants (closure-jit over large device buffers degrades
            # later Pallas launches on the axon relay — see bench_kernels)
            @partial(jax.jit, static_argnames=("k",))
            def _q_step(uvec, q_items, scales, ex, exc, k):
                if materialize:
                    b = uvec.shape[0]
                    # tail exclusions FIRST: exclude_count validity is
                    # positional (slots [0, count)), and the real exclusion
                    # lists pack their valid entries first
                    ex_full = jnp.concatenate(
                        [jnp.broadcast_to(tail_ex, (b, tail_ex.shape[0])), ex],
                        axis=1,
                    ) if has_tail else ex
                    exc_full = exc + tail_ex.shape[0] if has_tail else exc
                    return mips_topk_int8(
                        uvec, q_items, scales, k, ex_full, exc_full
                    )
                mask = exclusion_mask(items_padded, ex, exc)
                if has_tail:
                    mask = jnp.maximum(mask, _tail_mask(uvec.shape[0]))
                return streaming_mips_topk_int8(
                    uvec, q_items, scales, k, excl_mask=mask
                )

            @partial(jax.jit, static_argnames=("k",))
            def _q_step_plain(uvec, q_items, scales, k):
                if materialize:
                    b = uvec.shape[0]
                    if has_tail:
                        return mips_topk_int8(
                            uvec, q_items, scales, k,
                            jnp.broadcast_to(tail_ex, (b, tail_ex.shape[0])),
                            jnp.full((b,), tail_ex.shape[0], jnp.int32),
                        )
                    return mips_topk_int8(uvec, q_items, scales, k)
                mask = _tail_mask(uvec.shape[0]) if has_tail else None
                return streaming_mips_topk_int8(
                    uvec, q_items, scales, k, excl_mask=mask
                )

            def _step(uvec, item_emb, ex, exc, k):
                return _q_step(
                    uvec, self._q_items, self._item_scales, ex, exc, k
                )

            def _step_plain(uvec, item_emb, k):
                return _q_step_plain(
                    uvec, self._q_items, self._item_scales, k
                )
        else:
            @partial(jax.jit, static_argnames=("k",))
            def _step(uvec, item_emb, ex, exc, k):
                return auto_mips_topk(uvec, item_emb, k, ex, exc)

            @partial(jax.jit, static_argnames=("k",))
            def _step_plain(uvec, item_emb, k):
                return auto_mips_topk(uvec, item_emb, k)

        self._step, self._step_plain = _step, _step_plain

    @classmethod
    def from_lightgcn_artifacts(
        cls,
        artifact_dir: str,
        k: int = 12,
        exclude_edges=None,
        batch_size: int = 256,
        quantized: bool = False,
        mesh=None,
    ) -> "RetrievalServer":
        """Serve the tables exported by ``lightgcn_pipeline.export_artifacts``."""
        import os

        z = np.load(os.path.join(artifact_dir, "lightgcn_embeddings.npz"))
        return cls(
            z["users_emb_final"], z["items_emb_final"],
            k=k, exclude_edges=exclude_edges, batch_size=batch_size,
            quantized=quantized, mesh=mesh,
        )

    def recommend(
        self, user_ids: Sequence[int], k: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(item_ids [N, k], scores [N, k]) for arbitrary request sizes."""
        k = self.k if k is None else int(k)
        users = np.asarray(user_ids, np.int32)
        n = len(users)
        b = self.batch_size
        out_items = np.zeros((n, k), np.int32)
        out_scores = np.zeros((n, k), np.float32)
        for s in range(0, n, b):
            e = min(s + b, n)
            chunk = np.pad(users[s:e], (0, b - (e - s)))
            uvec = self.user_emb[jnp.asarray(chunk)]
            if self._ex is not None:
                vals, idx = self._step(
                    uvec, self.item_emb,
                    jnp.asarray(self._ex[chunk]),
                    jnp.asarray(self._exc[chunk]), k,
                )
            else:
                vals, idx = self._step_plain(uvec, self.item_emb, k)
            out_items[s:e] = np.asarray(idx)[: e - s]
            out_scores[s:e] = np.asarray(vals)[: e - s]
        return out_items, out_scores


class RankingServer:
    """Matcher candidates → hetero SAGE scoring → top-k per user."""

    def __init__(
        self,
        cfg: Config,
        data,                      # LinkPredData (serving split = "test")
        params,
        bn_state,
        split: str = "test",
        exclude_seen: bool = True,
        mesh=None,
    ):
        """``exclude_seen`` (default) masks EVERY already-interacted item of
        the split, which is what a server must do. ``False`` reproduces the
        reference's submission filter exactly (``run_submission.py:60-66``
        keeps label-0 edges only) — including its quirk that positives no
        matcher proposed re-enter the candidate set with label 0."""
        from .data.link_pred_data import LinkPredData  # noqa: F401 (doc)
        from .data.sampler import derive_budgets

        self.cfg = cfg
        self.data = data
        self.params = params
        self.bn_state = bn_state
        adj = data.splits[split]
        if exclude_seen:
            eu_ei = adj.user_csr
            seen, seen_count = padded_user_items(
                np.arange(data.num_users, dtype=np.int32),
                np.repeat(
                    np.arange(data.num_users, dtype=np.int64),
                    np.asarray(eu_ei.degrees, np.int64),
                ),
                eu_ei.cols.astype(np.int64),
            )
            self._seen, self._seen_count = seen, seen_count
        else:
            self._seen = self._seen_count = None
        max_deg = max(
            int(a.user_csr.degrees.max(initial=1)) for a in data.splits.values()
        )
        budgets = derive_budgets(
            cfg, max_deg, max(len(m) for m in data.matchers.values()),
            num_users=data.num_users, num_items=data.num_items,
        )
        self.sampler = SubgraphSampler(
            cfg, adj.user_csr, adj.item_csr, train=False,
            matchers=data.matchers[split], seed=0, budgets=budgets,
        )

        uf, itf = data.user_features, data.item_features
        uff, iff = data.user_features_float, data.item_features_float
        xid, xf = data.item_extra_ids, data.extra_features

        model_mesh = None
        if mesh is not None:
            from .parallel.mesh import MODEL_AXIS

            if mesh.shape[MODEL_AXIS] > 1:
                model_mesh = mesh

        @partial(jax.jit, static_argnames=("k",))
        def _infer_topk(params, bn_state, batch, seen, seen_count, k):
            scores = sage.infer(
                params, bn_state, batch, uf, itf, cfg,
                user_features_float=uff, item_features_float=iff,
                item_extra_ids=xid, extra_features=xf, mesh=model_mesh,
            )
            # candidates only: positives are already interacted → exclude
            # (run_submission.py:60-66 keeps only negative label edges)
            scores = jnp.where(batch.label > 0, sage.INFER_PAD, scores)
            if seen is not None:
                # strict serving mode: drop anything the user interacted
                # with, even label-0 XOR re-entries
                x = seen.shape[1]
                valid_seen = jnp.arange(x)[None, :] < seen_count[:, None]
                hit = (
                    batch.label_item_global[:, :, None]
                    == jnp.where(valid_seen, seen, -1)[:, None, :]
                ).any(-1)
                scores = jnp.where(hit, sage.INFER_PAD, scores)
            vals, pos = jax.lax.top_k(scores, k)
            items = jnp.take_along_axis(batch.label_item_global, pos, axis=1)
            valid = jnp.take_along_axis(batch.label_mask, pos, axis=1)
            valid &= vals > sage.INFER_PAD / 2
            return jnp.where(valid, items, -1), vals

        self._infer_topk = _infer_topk

    def recommend(
        self, user_ids: Sequence[int], k: Optional[int] = None
    ) -> np.ndarray:
        """Top-k candidate item ids per user ([N, k], -1 pads rows whose
        candidate pool ran short — including cold users with no
        interactions in the serving split, who get all -1)."""
        k = self.cfg.k if k is None else int(k)
        users = np.asarray(user_ids, np.int64)
        n = len(users)
        b = self.cfg.batch_size
        out = np.full((n, k), -1, np.int32)
        # the candidate grid is budgets.labels_per_user wide; top_k cannot
        # ask for more (mirrors make_eval_step's clamp)
        k_run = min(k, self.sampler.budgets.labels_per_user)
        # cold users (no interactions in this split) cannot be sampled —
        # the per-user positive draw requires degree ≥ 1; they answer -1
        warm_mask = self.sampler.users.degrees[users] > 0
        warm_pos = np.nonzero(warm_mask)[0]
        warm_users = users[warm_mask]
        for s in range(0, len(warm_users), b):
            e = min(s + b, len(warm_users))
            chunk = warm_users[s:e]
            if e - s < b:
                chunk = np.concatenate([chunk, np.full(b - (e - s), chunk[-1])])
            batch = self.sampler.sample_batch(chunk, valid_rows=e - s)
            if self._seen is not None:
                seen = jnp.asarray(self._seen[chunk])
                seen_count = jnp.asarray(self._seen_count[chunk])
            else:
                seen = seen_count = None
            items, _ = self._infer_topk(
                self.params, self.bn_state, batch, seen, seen_count, k_run
            )
            out[warm_pos[s:e], :k_run] = np.asarray(items)[: e - s]
        return out
