"""Hetero encoder-decoder training pipeline (the reference's main entry).

TPU-native counterpart of ``run_pipeline.py:24-153`` + ``training.py:19-106``:

* fused jitted train step (embed → hetero SAGE → decode → masked BCE →
  grads → Adam) — one compilation thanks to the sampler's static shapes,
* eval every ``eval_every`` epochs: ``infer`` scores over candidate label
  edges, per-user top-k, recall/precision vs the user's positives,
* save-on-val-precision-inflection checkpointing + periodic saves
  (``run_pipeline.py:104-127``),
* final TEST pass + ``Stats``.

Metric-semantics note: the reference's ``get_metrics_universal`` compares
top-k *positions in the candidate list* against *local item ids*
(``utils/metrics_encoder_decoder.py:72-81``) — a bug that makes its reported
recall/precision near-random (consistent with its tiny acceptance floors).
We implement the intended semantics: top-k candidate *items* vs ground-truth
items. Floors translated accordingly (ours are strictly harder).
"""
from __future__ import annotations

import os
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs import Config
from ..data.link_pred_data import LinkPredData, create_samplers
from ..data.sampler import SubgraphBatch, SubgraphSampler
from ..models import sage
from ..ops.metrics import recall_precision_at_k, topk_hits
from .checkpoint import save_state
from .reporting import (
    ContinousStatsTest,
    ContinousStatsTrain,
    ContinousStatsVal,
    Stats,
    report_results,
    setup_config,
)


@jax.jit
def _finite_all(tree) -> jnp.ndarray:
    """ONE jitted global reduction: True iff every float leaf is finite.

    Must be a single jit computation, not per-leaf eager ops: on a
    multi-process mesh each eager op on a sharded array is its own global
    computation, and interleaving many of them with in-flight collectives
    deadlocks the XLA CPU rendezvous (the gotcha documented in the verify
    notes). One jit = one computation, dispatched identically everywhere."""
    leaves = [
        x for x in jax.tree.leaves(tree)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
    ]
    if not leaves:
        return jnp.asarray(True)
    return jnp.all(jnp.stack([jnp.all(jnp.isfinite(x)) for x in leaves]))


def make_train_step(cfg: Config, data: LinkPredData, tx, mesh=None):
    """Fused jitted train step. With a multi-device ``mesh``, the per-user
    label grid (the decoder's [B, L] batch axis) is constrained onto the
    ``data`` axis — the DP split of the ranking stack (encoder node slots
    are shared across the batch and stay replicated)."""
    uf, itf = data.user_features, data.item_features
    uff, iff = data.user_features_float, data.item_features_float
    xid, xf = data.item_extra_ids, data.extra_features

    batch_constraint = None
    model_mesh = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

        if mesh.shape[DATA_AXIS] > 1:
            batch_constraint = NamedSharding(mesh, P(DATA_AXIS))
        if mesh.shape[MODEL_AXIS] > 1:
            # feature tables are row-sharded: lookups go through the
            # cross-shard exchange (ops/embedding.sharded_embedding_lookup)
            model_mesh = mesh

    def constrain(batch: SubgraphBatch) -> SubgraphBatch:
        if batch_constraint is None:
            return batch
        import dataclasses as _dc

        grid_fields = (
            "label_src", "label_dst", "label", "label_mask", "label_item_global",
        )
        reps = {
            f: jax.lax.with_sharding_constraint(getattr(batch, f), batch_constraint)
            for f in grid_fields
        }
        return _dc.replace(batch, **reps)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, bn_state, opt_state, batch: SubgraphBatch, key):
        batch = constrain(batch)

        def loss_fn(p):
            logits, new_bn = sage.forward(
                p, bn_state, batch, uf, itf, cfg, train=True, rng=key,
                user_features_float=uff, item_features_float=iff,
                item_extra_ids=xid, extra_features=xf, mesh=model_mesh,
            )
            return sage.bce_loss(logits, batch), new_bn

        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, new_bn, opt_state, loss

    return step


def make_eval_step(cfg: Config, data: LinkPredData, mesh=None):
    uf, itf = data.user_features, data.item_features
    uff, iff = data.user_features_float, data.item_features_float
    xid, xf = data.item_extra_ids, data.extra_features

    model_mesh = None
    if mesh is not None:
        from ..parallel.mesh import MODEL_AXIS

        if mesh.shape[MODEL_AXIS] > 1:
            model_mesh = mesh

    @jax.jit
    def eval_step(params, bn_state, batch: SubgraphBatch):
        scores = sage.infer(
            params, bn_state, batch, uf, itf, cfg,
            user_features_float=uff, item_features_float=iff,
            item_extra_ids=xid, extra_features=xf, mesh=model_mesh,
        )
        # per-user top-k over candidate label edges → their global item ids
        k = min(cfg.k, scores.shape[1])
        _, pos = jax.lax.top_k(scores, k)
        topk_items = jnp.take_along_axis(batch.label_item_global, pos, axis=1)
        # invalid slots (INFER_PAD) may still be selected when a user has
        # fewer than k candidates — poison them so they can't hit
        topk_valid = jnp.take_along_axis(batch.label_mask, pos, axis=1)
        topk_items = jnp.where(topk_valid, topk_items, -2)
        r = topk_hits(topk_items, batch.gt_items, batch.gt_count)
        recall, precision = recall_precision_at_k(r, batch.gt_count, cfg.k)
        return recall, precision

    return eval_step


def test_with_sampler(
    cfg: Config,
    params,
    bn_state,
    sampler: SubgraphSampler,
    eval_step,
    break_at: Optional[int] = None,
) -> Tuple[float, float]:
    """Mean of per-batch metrics — reference ``test_with_dataloader``
    (``training.py:85-106``)."""
    recalls, precisions = [], []
    for i, batch in enumerate(sampler.epoch_batches(shuffle=False)):
        if break_at and i == break_at:
            break
        r, p = eval_step(params, bn_state, batch)
        recalls.append(float(r))
        precisions.append(float(p))
    return float(np.mean(recalls or [0.0])), float(np.mean(precisions or [0.0]))


def run_pipeline(
    cfg: Config,
    data: LinkPredData,
    model_dir: str = "model/saved",
    log_fn=print,
    randomization: bool = True,
    return_state: bool = False,
    resume: bool = False,
    mesh=None,
    graph_store=None,
):
    """Full training run — reference ``run_pipeline.py:24-153``.

    ``graph_store`` selects the DB-backed sampler (the reference's
    ``config.neo4j`` switch) — see ``data/link_pred_data.create_samplers``.
    """
    cfg.print()
    cfg.check_validity()
    if mesh is None:
        # honor cfg.mesh for launcher-driven runs (same contract as
        # lightgcn_pipeline.train): any multi-process launch or an explicit
        # non-default axis spec spans ALL devices; the default stays
        # single-device (the reference's setting)
        mc = getattr(cfg, "mesh", None)
        explicit = mc is not None and (mc.data_axis, mc.model_axis) != (-1, 1)
        if jax.process_count() > 1 or explicit:
            from ..parallel.mesh import build_mesh

            mesh = build_mesh(mc.data_axis, mc.model_axis)
    wandb, cfg = setup_config("Fashion-Recomm-GNN", cfg.wandb_enabled, cfg)

    key = jax.random.PRNGKey(cfg.seed)
    train_s, val_s, test_s = create_samplers(
        cfg, data, seed=cfg.seed, randomization=randomization,
        graph_store=graph_store,
    )

    feature_info = sage.get_feature_info(data.graph)
    key, k_init = jax.random.split(key)
    params, bn_state = sage.init_sage_params(
        k_init, cfg, feature_info, float_dims=data.float_dims(),
        num_extra=data.num_extra, mesh=mesh,
    )
    tx = optax.adam(cfg.learning_rate)
    opt_state = tx.init(params)

    # true resume (absent in the reference — its checkpoints carry no
    # optimizer state or epoch, SURVEY §5): pick up params + optimizer +
    # epoch from the newest checkpoint in model_dir
    start_epoch = 0
    if resume:
        from .checkpoint import load_latest

        template = {
            "params": params, "bn_state": bn_state, "opt_state": opt_state,
            "epoch": np.zeros((), np.int64),
        }
        state, ver = load_latest(model_dir, template)
        if ver is not None:
            # restored leaves come back committed to one device; re-place
            # them with the template's shardings so sharded tables resume
            # sharded (and jit sees one consistent placement)
            def _replace(x, t):
                sh = getattr(t, "sharding", None)
                if sh is not None and len(sh.device_set) > 1:
                    return jax.device_put(jnp.asarray(x), sh)
                if hasattr(x, "dtype"):
                    # host round-trip drops the restore's single-device
                    # commitment so jit is free to co-locate with the
                    # sharded leaves
                    return jnp.asarray(np.asarray(x))
                return x

            state = jax.tree.map(_replace, state, template)
            params = state["params"]
            bn_state = state["bn_state"]
            opt_state = state["opt_state"]
            start_epoch = int(state["epoch"]) + 1
            # decorrelate the resumed step-key stream from epoch 0's
            # (mirrors lightgcn_pipeline's fold_in(key, start_it)): without
            # this a resumed run replays the same dropout/negative-sampling
            # keys it already consumed
            key = jax.random.fold_in(key, start_epoch)
            log_fn(f"| Resuming from checkpoint (epoch {start_epoch})...")

    step = make_train_step(cfg, data, tx, mesh=mesh)
    eval_step = make_eval_step(cfg, data, mesh=mesh)

    # sharded runs checkpoint through orbax (per-host shard persistence);
    # single-host keeps the flat npz — see checkpoint.save_state
    sharded_ckpt = False
    if mesh is not None:
        from ..parallel.mesh import MODEL_AXIS

        sharded_ckpt = mesh.shape[MODEL_AXIS] > 1

    old_val_precision = -1.0
    val_recall = val_precision = 0.0
    losses: List[float] = [0.0]
    loss_curve: List[float] = []

    from ..data.prefetch import prefetch

    last_good = None  # (params, bn_state, opt_state) snapshot for NaN rollback

    for epoch in range(start_epoch, cfg.epochs):
        losses = []
        if cfg.num_workers > 1:
            # the reference DataLoader's num_workers as GIL-releasing
            # sampler threads (sampler.parallel_epoch_batches); prefetch
            # still overlaps the device step with the reordered stream
            from ..data.sampler import parallel_epoch_batches

            feed = prefetch(
                parallel_epoch_batches(
                    train_s, num_workers=cfg.num_workers, shuffle=True
                ),
                buffer_size=cfg.num_workers,
            )
        else:
            feed = prefetch(train_s.epoch_batches(shuffle=True), buffer_size=1)
        for batch in feed:
            key, k_step = jax.random.split(key)
            params, bn_state, opt_state, loss = step(
                params, bn_state, opt_state, batch, k_step
            )
            losses.append(float(loss))
        # failure detection (SURVEY §5: absent in the reference — crashes
        # kill its runs): a non-finite epoch rolls back to the last good
        # epoch-end state instead of poisoning the tables. The snapshot
        # itself is validated too (params AND optimizer state — an inf Adam
        # second moment keeps params finite while zeroing later updates):
        # the epoch losses come from PRE-update params, so the final
        # update of the epoch could land non-finite with a finite mean
        if not np.isfinite(np.mean(losses)) or not bool(
            _finite_all((params, bn_state, opt_state))
        ):
            if last_good is not None:
                log_fn(
                    f"TRAIN | epoch: {epoch} | non-finite loss — rolling back "
                    "to last good epoch state"
                )
                # hand out copies: the next epoch's step donates its inputs,
                # which would delete the snapshot itself
                params, bn_state, opt_state = jax.tree.map(jnp.copy, last_good)
                continue
            raise FloatingPointError(
                f"non-finite loss in epoch {epoch} with no prior good state"
            )
        # device-side copies: the train step donates its inputs, so holding
        # the live arrays would alias buffers the next epoch overwrites
        last_good = jax.tree.map(
            jnp.copy, (params, bn_state, opt_state)
        )
        # truncation telemetry (VERDICT r2 item 10): padded-batch overflow is
        # the classic silent-correctness trap at scale — surface the sampler's
        # counters every epoch and in the final Stats instead of hiding them
        trunc = dict(getattr(train_s, "truncations", {}) or {})
        trunc_note = (
            f" | truncations: {trunc}" if any(trunc.values()) else ""
        )
        loss_curve.append(float(np.mean(losses)))
        log_fn(f"TRAIN | epoch: {epoch} | loss: {np.mean(losses):.4f}{trunc_note}")
        report_results(
            ContinousStatsTrain(type="train", loss=float(np.mean(losses)), epoch=epoch),
            wandb, final=False,
        )

        if epoch % cfg.eval_every == 0 and epoch != 0:
            val_recall, val_precision = test_with_sampler(
                cfg, params, bn_state, val_s, eval_step, cfg.evaluate_break_at
            )
            log_fn(
                f"VAL   | epoch: {epoch} | recall: {val_recall:.4f} "
                f"| precision: {val_precision:.4f}"
            )
            # save-on-generalization-inflection (run_pipeline.py:104-112)
            if cfg.save_model:
                if val_precision >= old_val_precision:
                    old_val_precision = val_precision
                else:
                    log_fn("| Saving Best Generalized Model...")
                    save_state(
                        os.path.join(model_dir, "model_final"),
                        {"params": params, "bn_state": bn_state,
                         "opt_state": opt_state, "epoch": np.int64(epoch)},
                        sharded=sharded_ckpt,
                    )
                    old_val_precision = -1.0
            report_results(
                ContinousStatsVal(
                    type="val", recall_val=val_recall,
                    precision_val=val_precision, epoch=epoch,
                ),
                wandb, final=False,
            )

        if cfg.save_model and epoch % max(1, int(cfg.epochs * cfg.save_every)) == 0:
            save_state(
                os.path.join(model_dir, f"model_{epoch:03d}"),
                {"params": params, "bn_state": bn_state,
                 "opt_state": opt_state, "epoch": np.int64(epoch)},
                sharded=sharded_ckpt,
            )

    test_recall, test_precision = test_with_sampler(
        cfg, params, bn_state, test_s, eval_step, cfg.evaluate_break_at
    )
    log_fn(f"TEST  | recall: {test_recall:.4f} | precision: {test_precision:.4f}")
    report_results(
        ContinousStatsTest(
            type="test", recall_test=test_recall, precision_test=test_precision
        ),
        wandb, final=True,
    )
    # aggregate truncation counters across all three samplers (train/val/test)
    agg: dict = {}
    for s in (train_s, val_s, test_s):
        for k_, v in (getattr(s, "truncations", {}) or {}).items():
            agg[k_] = agg.get(k_, 0) + int(v)
    stats = Stats(
        loss=float(np.mean(losses)),
        recall_val=val_recall,
        recall_test=test_recall,
        precision_val=val_precision,
        precision_test=test_precision,
        truncations=agg,
        loss_curve=loss_curve,
    )
    if return_state:
        return stats, params, bn_state
    return stats
