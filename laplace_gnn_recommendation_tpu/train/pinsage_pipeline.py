"""PinSAGE training / eval pipeline.

Counterpart of reference ``pinsage/model.py:36-134`` + ``pinsage/
evaluation.py:18-73`` (+ the bit-rotted ``run_pinsage.py``, whose *behavior*
— not its broken imports — is the spec, per SURVEY "known quirks"):

* epochs of (head, tail, neg) margin-loss batches over random-walk blocks,
* eval: embed ALL items via the block sampler, then latest-item
  nearest-neighbor retrieval per user with interacted-item exclusion,
  scored as HITS@k (fraction of users whose top-k contains a val item).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.pinsage_data import PinSAGEData, PinSAGESampler, build_pinsage_data
from ..models import pinsage as M
from ..ops.topk import masked_topk


@dataclass
class PinSAGEConfig:
    """Defaults of reference ``run_pinsage.py:6-37`` / ``pinsage/model.py:137-160``."""

    random_walk_length: int = 2
    random_walk_restart_prob: float = 0.5
    num_random_walks: int = 10
    num_neighbors: int = 3
    num_layers: int = 2
    hidden_dims: int = 16
    batch_size: int = 32
    num_epochs: int = 10
    batches_per_epoch: int = 20000
    lr: float = 3e-5
    k: int = 10
    seed: int = 0
    sparse_embedding: bool = False
    """Lazy row-sparse Adam on the id-embedding table + biases (the
    reference's SparseAdam variant, ``pinsage/model_sparse.py:104-127``) —
    only the batch's touched rows move through HBM per step."""


# cached jitted sharded-retrieval chunk fns, keyed by (mesh, k, num_valid) —
# eager shard_map dispatch per chunk costs minutes over the remote relay
_SHARDED_HITS_CACHE: dict = {}


def _sharded_hits_topk(mesh, k: int, num_valid: int):
    key = (mesh, k, num_valid)
    fn = _SHARDED_HITS_CACHE.get(key)
    if fn is None:
        from ..ops.topk import sharded_mips_topk

        @jax.jit
        def fn(queries, sharded_h, excl, cnt):
            return sharded_mips_topk(
                mesh, queries, sharded_h, k, excl, cnt,
                num_valid_items=num_valid,
            )

        _SHARDED_HITS_CACHE[key] = fn
    return fn


def embed_all_items(
    cfg: PinSAGEConfig,
    params: dict,
    data: PinSAGEData,
    sampler: PinSAGESampler,
    item_features: jnp.ndarray,
    item_features_float: Optional[jnp.ndarray],
) -> np.ndarray:
    """h_item for every item via block sampling in batches (reference
    ``pinsage/model.py:121-132`` with ``collate_test``)."""
    reprs = np.zeros((data.num_items, cfg.hidden_dims), np.float32)

    @jax.jit
    def repr_fn(params, blocks):
        return M.get_repr(params, blocks, item_features, item_features_float, train=False)

    bs = sampler.dst_budget[0]
    for s in range(0, data.num_items, bs):
        seeds = np.arange(s, min(s + bs, data.num_items))
        blocks, _ = sampler.sample_blocks(seeds)
        h = np.asarray(repr_fn(params, blocks))
        reprs[seeds] = h[: len(seeds)]
    return reprs


def hits_at_k(
    data: PinSAGEData,
    h_item: np.ndarray,
    k: int,
    split: str = "val",
    batch_size: int = 512,
    mesh=None,
    user_cap: Optional[int] = None,
) -> float:
    """LatestNNRecommender + HITS@k (reference ``pinsage/evaluation.py:8-73``):
    for each user, rank items by similarity to their latest train item,
    excluding already-interacted items; hit if any top-k item is in the
    split's ground truth.

    With a model-sharded ``mesh`` the catalog sweep runs the distributed
    MIPS path (row-sharded item embeddings, per-shard top-k + all-gather
    merge) — the same production retrieval as ``RetrievalServer``."""
    gt = data.val_items if split == "val" else data.test_items
    h = jnp.asarray(h_item)
    sharded_h = None
    num_valid = h_item.shape[0]
    if mesh is not None:
        from ..parallel.mesh import MODEL_AXIS, row_sharding, shard_rows_pad

        if mesh.shape[MODEL_AXIS] > 1:
            i_pad = shard_rows_pad(num_valid, mesh)
            sharded_h = jax.device_put(
                jnp.pad(h, ((0, i_pad - num_valid), (0, 0))),
                row_sharding(mesh),
            )
    hits = []
    # only users the recommender can serve: ground truth present AND a
    # latest train interaction to query with
    users = [
        u for u in range(data.num_users)
        if len(gt[u]) > 0 and data.latest_item_per_user[u] >= 0
    ]
    if user_cap is not None and len(users) > user_cap:
        # deterministic evenly-spaced cap (the at-scale eval convention of
        # lightgcn_pipeline's capped metric sweeps)
        users = [users[i] for i in
                 np.linspace(0, len(users) - 1, user_cap).astype(np.int64)]
    max_deg = max((data.user_csr.degree(u) for u in users), default=1)

    for s in range(0, len(users), batch_size):
        chunk = users[s : s + batch_size]
        n_real = len(chunk)
        if n_real < batch_size:
            # pad the tail chunk to the one fixed batch shape: compiling a
            # SECOND [B', I] program against the same catalog-wide operands
            # reproducibly wedges the relay-hosted TPU worker (INTERNAL
            # backend error / worker crash on the 10000%512-row tail —
            # minimal repro: a [512, 104547] matmul then a [272, 104547]
            # one). One static shape is also simply the right TPU design.
            chunk = chunk + [chunk[-1]] * (batch_size - n_real)
        latest = data.latest_item_per_user[chunk]
        excl = np.full((len(chunk), max_deg), -1, np.int64)
        cnt = np.zeros(len(chunk), np.int32)
        for row, u in enumerate(chunk):
            items = data.user_csr.neighbors(u)
            excl[row, : len(items)] = items
            cnt[row] = len(items)
        if sharded_h is not None:
            _, topk = _sharded_hits_topk(mesh, k, num_valid)(
                h[jnp.asarray(latest)], sharded_h,
                jnp.asarray(excl.astype(np.int32)), jnp.asarray(cnt),
            )
        else:
            scores = jnp.asarray(h)[jnp.asarray(latest)] @ h.T
            _, topk = masked_topk(
                scores, k, jnp.asarray(excl.astype(np.int32)), jnp.asarray(cnt)
            )
        topk = np.asarray(topk)
        for row, u in enumerate(chunk[:n_real]):
            hits.append(bool(np.isin(topk[row], gt[u]).any()))
    return float(np.mean(hits)) if hits else 0.0


def train(
    cfg: PinSAGEConfig,
    data: PinSAGEData,
    log_fn=print,
    mesh=None,
    checkpoint_dir: Optional[str] = None,
    max_epochs_this_run: Optional[int] = None,
) -> dict:
    """Training loop (reference ``pinsage/model.py:105-134``). Returns a dict
    with final params, item embeddings and HITS@k per split.

    With a multi-device ``mesh``: the (head, tail, neg) pair batch splits
    over the ``data`` axis (DP) and the HITS@k catalog sweeps run the
    distributed MIPS path over the ``model`` axis.

    ``checkpoint_dir`` enables epoch-granular checkpoint/resume
    (params + optimizer [+ sparse-Adam] state, npz via
    ``train.checkpoint``): a fresh call resumes from the newest
    ``pinsage_<epoch>`` checkpoint with the PRNG key folded by the start
    epoch (the resume replays no step-key stream). Combined with
    ``max_epochs_this_run`` this supports process-per-leg drivers that
    isolate device-relay wedges (the same pattern as the HPO study's
    one-process-per-rung legs): each process trains a bounded number of
    epochs and exits; the final test HITS eval runs only in the leg that
    completes ``cfg.num_epochs``. Early-exit calls return
    ``completed=False`` and no ``test_hits``."""
    sampler = PinSAGESampler(
        data,
        random_walk_length=cfg.random_walk_length,
        random_walk_restart_prob=cfg.random_walk_restart_prob,
        num_random_walks=cfg.num_random_walks,
        num_neighbors=cfg.num_neighbors,
        num_layers=cfg.num_layers,
        batch_size=cfg.batch_size,
        seed=cfg.seed,
    )
    item_features = jnp.asarray(data.item_features)
    item_features_float = (
        jnp.asarray(data.item_features_float)
        if data.item_features_float is not None
        else None
    )
    cards = (
        data.item_features.max(axis=0).tolist() if data.item_features.size else []
    )
    key = jax.random.PRNGKey(cfg.seed)
    key, k_init = jax.random.split(key)
    params = M.init_pinsage_params(
        k_init, data.num_items, [int(c) for c in cards], cfg.hidden_dims,
        cfg.num_layers,
        float_feature_dim=(
            data.item_features_float.shape[1]
            if data.item_features_float is not None else 0
        ),
    )
    if cfg.sparse_embedding:
        from .optim import init_sparse_adam_state, sparse_rows_adam_update

        mask = jax.tree.map(lambda _: True, params)
        mask["proj"]["id_table"] = False
        mask["bias"] = False
        tx = optax.masked(optax.adam(cfg.lr), mask)
        opt_state = tx.init(params)
        sparse_state = {
            "id": init_sparse_adam_state(params["proj"]["id_table"]),
            "bias": init_sparse_adam_state(params["bias"]),
        }

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def step_sparse(params, opt_state, sparse_state, batch, k):
            src = batch.blocks[0].src_ids
            smask = batch.blocks[0].src_mask
            dst = batch.blocks[-1].dst_ids
            dmask = batch.blocks[-1].dst_mask
            id_rows = params["proj"]["id_table"][src]
            bias_rows = params["bias"][dst]

            def loss_fn(p, id_rows, bias_rows):
                return M.margin_loss(
                    p, batch, item_features, item_features_float,
                    train=True, rng=k, id_rows=id_rows, bias_rows=bias_rows,
                )

            loss, (g_dense, g_id, g_bias) = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2)
            )(params, id_rows, bias_rows)
            updates, opt_state = tx.update(g_dense, opt_state, params)
            params = optax.apply_updates(params, updates)
            new_id, s_id = sparse_rows_adam_update(
                params["proj"]["id_table"], sparse_state["id"],
                src, smask, g_id, cfg.lr,
            )
            new_bias, s_bias = sparse_rows_adam_update(
                params["bias"], sparse_state["bias"], dst, dmask, g_bias, cfg.lr,
            )
            params["proj"]["id_table"] = new_id
            params["bias"] = new_bias
            return params, opt_state, {"id": s_id, "bias": s_bias}, loss

        def step(params, opt_state, batch, k):
            nonlocal sparse_state
            params, opt_state, sparse_state, loss = step_sparse(
                params, opt_state, sparse_state, batch, k
            )
            return params, opt_state, loss

    else:
        tx = optax.adam(cfg.lr)
        opt_state = tx.init(params)

        pair_constraint = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS

            if mesh.shape[DATA_AXIS] > 1:
                pair_constraint = NamedSharding(mesh, P(DATA_AXIS))

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, batch, k):
            if pair_constraint is not None:
                batch = dataclasses.replace(
                    batch,
                    **{
                        f: jax.lax.with_sharding_constraint(
                            getattr(batch, f), pair_constraint
                        )
                        for f in (
                            "pos_head", "pos_tail", "neg_head", "neg_tail",
                            "pair_mask",
                        )
                    },
                )

            def loss_fn(p):
                return M.margin_loss(
                    p, batch, item_features, item_features_float, train=True, rng=k
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

    loss = jnp.zeros(())
    val_hits = 0.0
    from ..data.prefetch import prefetch

    start_epoch = 0

    def _ckpt_state():
        st = {"params": params, "opt_state": opt_state}
        if cfg.sparse_embedding:
            st["sparse_state"] = sparse_state
        return st

    if checkpoint_dir:
        import os

        from .checkpoint import load_latest, save_state

        restored, ver = load_latest(
            checkpoint_dir, _ckpt_state(), prefix="pinsage_"
        )
        if ver is not None:
            params = restored["params"]
            opt_state = restored["opt_state"]
            if cfg.sparse_embedding:
                sparse_state = restored["sparse_state"]
            start_epoch = int(ver)
            # do not replay the epoch-0 step-key stream on resume
            # (mirrors lightgcn_pipeline's fold_in(key, start_it))
            key = jax.random.fold_in(key, start_epoch)
            log_fn(f"[resume] from epoch {start_epoch}")

    epochs_this_run = 0
    for epoch in range(start_epoch, cfg.num_epochs):
        # host sampling + host→device upload overlap the device step via a
        # prefetch thread with an async device_put transform — the
        # serialized sample→upload→step loop left the device idle most of
        # each step at full-catalog scale (see ROOFLINE.json pinsage_step)
        def _epoch_batches():
            for _ in range(cfg.batches_per_epoch):
                b = sampler.sample_train_batch()
                if b is not None:
                    yield b

        for batch in prefetch(
            _epoch_batches(), buffer_size=2, transform=jax.device_put
        ):
            key, k_step = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, batch, k_step)
        h_item = embed_all_items(
            cfg, params, data, sampler, item_features, item_features_float
        )
        val_hits = hits_at_k(data, h_item, cfg.k, "val", mesh=mesh)
        log_fn(
            f"[epoch {epoch}] loss: {float(loss):.5f} HITS@{cfg.k} (val): {val_hits:.5f}"
        )
        if checkpoint_dir:
            save_state(
                os.path.join(checkpoint_dir, f"pinsage_{epoch + 1}"),
                _ckpt_state(),
            )
        epochs_this_run += 1
        if (
            max_epochs_this_run is not None
            and epochs_this_run >= max_epochs_this_run
            and epoch + 1 < cfg.num_epochs
        ):
            return {
                "params": params,
                "val_hits": val_hits,
                "loss": float(loss),
                "completed": False,
                "epochs_done": epoch + 1,
            }

    h_item = embed_all_items(
        cfg, params, data, sampler, item_features, item_features_float
    )
    test_hits = hits_at_k(data, h_item, cfg.k, "test", mesh=mesh)
    log_fn(f"HITS@{cfg.k} (test): {test_hits:.5f}")
    return {
        "params": params,
        "item_embeddings": h_item,
        "val_hits": val_hits,
        "test_hits": test_hits,
        "loss": float(loss),
        "completed": True,
        "epochs_done": cfg.num_epochs,
    }


def run_pinsage_cli(artifact_dir: str) -> None:
    """CLI entry: artifacts → PinSAGE training (reference ``run_pinsage.py``)."""
    from ..data.etl import load_artifacts

    a = load_artifacts(artifact_dir)
    data = build_pinsage_data(a)
    cfg = PinSAGEConfig(num_epochs=2, batches_per_epoch=200)
    train(cfg, data)
