"""Kaggle submission writer (MAP@12 format).

Counterpart of reference ``run_submission.py:14-96``: load the newest
checkpoint by filename version, run inference over the test split, rank only
candidate (label-0) edges per user, keep top-k article ids, map back to raw
ids, and write ``submission.csv`` with columns ``customer_id, prediction``
(space-joined article ids).
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import Config
from ..data.link_pred_data import LinkPredData, create_samplers
from ..models import sage
from .checkpoint import load_latest


def make_predictions(
    cfg: Config, params, bn_state, data: LinkPredData, test_sampler, mesh=None
) -> Dict[int, np.ndarray]:
    """Per-user top-k candidate article ids (global contiguous ids).

    Positive-labeled edges are excluded from ranking (reference
    ``run_submission.py:59-66`` keeps only ``edge_label == 0``).
    With a multi-device ``mesh`` whose model axis is >1, inference goes
    through the sharded feature-table lookups (same contract as
    ``encdec_pipeline.make_eval_step``)."""
    uf, itf = data.user_features, data.item_features
    uff, iff = data.user_features_float, data.item_features_float

    model_mesh = None
    if mesh is not None:
        from ..parallel.mesh import MODEL_AXIS

        if mesh.shape[MODEL_AXIS] > 1:
            model_mesh = mesh

    @jax.jit
    def predict(params, bn_state, batch):
        scores = sage.infer(
            params, bn_state, batch, uf, itf, cfg,
            user_features_float=uff, item_features_float=iff,
            mesh=model_mesh,
        )
        scores = jnp.where(batch.label == 0, scores, sage.INFER_PAD)
        k = min(cfg.k, scores.shape[1])
        _, pos = jax.lax.top_k(scores, k)
        items = jnp.take_along_axis(batch.label_item_global, pos, axis=1)
        valid = jnp.take_along_axis(
            batch.label_mask & (batch.label == 0), pos, axis=1
        )
        return jnp.where(valid, items, -1)

    out: Dict[int, np.ndarray] = {}
    for batch in test_sampler.epoch_batches(shuffle=False):
        items = np.asarray(predict(params, bn_state, batch))
        seeds = np.asarray(batch.seed_users)
        for row, u in enumerate(seeds):
            # first write wins; padded last-batch rows repeat the final user
            if int(u) not in out:
                out[int(u)] = items[row]
    return out


def map_to_raw_ids(
    predictions: Dict[int, np.ndarray],
    customer_id_map_forward: Dict[str, object],
    article_id_map_forward: Dict[str, object],
) -> Tuple[list, list]:
    """Contiguous ids → raw dataset ids (reference ``run_submission.py:30-45``)."""
    customers, preds = [], []
    for u in sorted(predictions):
        raw_c = customer_id_map_forward[str(u)]
        raw_items = [
            str(article_id_map_forward[str(int(i))])
            for i in predictions[u]
            if int(i) >= 0
        ]
        customers.append(str(raw_c))
        preds.append(" ".join(raw_items))
    return customers, preds


def save_csv(path: str, customers: list, preds: list) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("customer_id,prediction\n")
        for c, p in zip(customers, preds):
            f.write(f"{c},{p}\n")


def submission_pipeline(
    cfg: Config,
    data: LinkPredData,
    customer_id_map_forward: Dict[str, object],
    article_id_map_forward: Dict[str, object],
    model_dir: str = "model/saved",
    out_path: str = "data/derived/submission.csv",
    params_bn: Optional[Tuple] = None,
    mesh=None,
) -> str:
    """Full submission flow — reference ``run_submission.py:78-92``.

    ``params_bn=(params, bn_state)`` skips checkpoint loading (useful right
    after training in the same process)."""
    if params_bn is None:
        print("| Loading Model...")
        feature_info = sage.get_feature_info(data.graph)
        template_params, template_bn = sage.init_sage_params(
            jax.random.PRNGKey(0), cfg, feature_info, float_dims=data.float_dims()
        )
        state, ver = load_latest(
            model_dir, {"params": template_params, "bn_state": template_bn,
                        "opt_state": None}
        )
        if ver is None:
            raise FileNotFoundError(f"no checkpoint under {model_dir}")
        params, bn_state = state["params"], state["bn_state"]
    else:
        params, bn_state = params_bn

    print("| Building test sampler...")
    _, _, test_sampler = create_samplers(cfg, data)

    print("| Making Predictions...")
    preds = make_predictions(cfg, params, bn_state, data, test_sampler, mesh=mesh)

    print("| Mapping to raw ids...")
    customers, pred_strs = map_to_raw_ids(
        preds, customer_id_map_forward, article_id_map_forward
    )

    print("| Saving predictions...")
    save_csv(out_path, customers, pred_strs)
    return out_path
