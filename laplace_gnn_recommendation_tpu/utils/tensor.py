"""1-D set ops and ragged→dense padding helpers.

Counterpart of reference ``utils/tensor.py:8-61`` (torch) in numpy/jnp. The
hot paths of the framework never build ragged lists (the sampler emits dense
grids directly), so these are utility-grade: host-side tooling, tests, and
API parity for users migrating from the reference.
"""
from __future__ import annotations

from typing import List, Sequence, Union

import numpy as np


def intersection_1d(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elements present in both arrays (reference ``utils/tensor.py:8-14``)."""
    return np.intersect1d(np.asarray(a), np.asarray(b))


def difference_1d(a: np.ndarray, b: np.ndarray, assume_unique: bool = False) -> np.ndarray:
    """Elements of ``a`` not in ``b``, preserving ``a``'s order — the
    semantics ``make_predictions_for_user`` relies on
    (``utils/metrics_lightgcn.py:139-142``: topk order must survive)."""
    a = np.asarray(a)
    mask = ~np.isin(a, np.asarray(b), assume_unique=assume_unique)
    return a[mask]


def flatten(nested: Sequence[Sequence]) -> list:
    """List-of-lists flatten (reference ``utils/flatten.py:4-5``)."""
    return [item for sub in nested for item in sub]


def padded_stack(
    arrays: List[np.ndarray],
    side: str = "right",
    value: Union[int, float] = 0,
) -> np.ndarray:
    """Stack 1-D/2-D arrays, padding the last dim to the max length
    (reference ``utils/tensor.py:24-61``)."""
    full = max(int(np.asarray(x).shape[-1]) for x in arrays)
    out = []
    for x in arrays:
        x = np.asarray(x)
        pad = full - x.shape[-1]
        if pad > 0:
            widths = [(0, 0)] * (x.ndim - 1) + (
                [(pad, 0)] if side == "left" else [(0, pad)]
            )
            x = np.pad(x, widths, constant_values=value)
        out.append(x)
    return np.stack(out, axis=0)
