"""ctypes bindings for the native sampler library, compiled on demand.

The shared library is rebuilt automatically when ``sampler.cpp`` changes
(source-hash stamp). If no C++ toolchain is available the import still
succeeds with ``LIB = None`` and callers fall back to the Python samplers.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "sampler.cpp")
_BUILD = os.path.join(_DIR, "_build")
_SO = os.path.join(_BUILD, "libsampler.so")
_STAMP = os.path.join(_BUILD, "source.sha256")


def _build_if_needed() -> Optional[str]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    if os.path.exists(_SO) and os.path.exists(_STAMP):
        with open(_STAMP) as f:
            if f.read().strip() == digest:
                return _SO
    os.makedirs(_BUILD, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:  # pragma: no cover
        print(f"[native] build failed, falling back to Python samplers: {e}")
        return None
    with open(_STAMP, "w") as f:
        f.write(digest)
    return _SO


def _load() -> Optional[ctypes.CDLL]:
    so = _build_if_needed()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")

    lib.nhop_sample.restype = ctypes.c_int64
    lib.nhop_sample.argtypes = [
        i64p, i32p, i64p, i32p,
        ctypes.c_int64, ctypes.c_int64,
        i32p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.c_uint64,
        i32p, i32p, ctypes.c_int64,
        i64p,
    ]
    lib.pinsage_frontier.restype = None
    lib.pinsage_frontier.argtypes = [
        i64p, i32p, i64p, i32p,
        i32p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_double,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.c_uint64,
        i32p, f32p,
    ]
    lib.walk_step.restype = None
    lib.walk_step.argtypes = [
        i64p, i32p, i64p, i32p,
        i32p, ctypes.c_int64, ctypes.c_uint64, i32p,
    ]
    return lib


LIB = _load()


def nhop_sample(
    user_row_ptr: np.ndarray, user_cols: np.ndarray,
    item_row_ptr: np.ndarray, item_cols: np.ndarray,
    num_users: int, num_items: int,
    seeds: np.ndarray, n_hops: int, num_neighbors: int, rng_seed: int,
    max_edges_hint: int = 1 << 16,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch BFS → (src, dst, offsets). Grows the buffer on overflow."""
    assert LIB is not None
    seeds = np.ascontiguousarray(seeds, np.int32)
    n = len(seeds)
    offsets = np.zeros(n + 1, np.int64)
    cap = max_edges_hint
    while True:
        src = np.empty(cap, np.int32)
        dst = np.empty(cap, np.int32)
        total = LIB.nhop_sample(
            np.ascontiguousarray(user_row_ptr, np.int64),
            np.ascontiguousarray(user_cols, np.int32),
            np.ascontiguousarray(item_row_ptr, np.int64),
            np.ascontiguousarray(item_cols, np.int32),
            num_users, num_items,
            seeds, n, n_hops, num_neighbors,
            np.uint64(rng_seed & 0xFFFFFFFFFFFFFFFF),
            src, dst, cap, offsets,
        )
        if total >= 0:
            return src[:total], dst[:total], offsets
        cap *= 4


def pinsage_frontier(
    user_row_ptr, user_cols, item_row_ptr, item_cols,
    seeds: np.ndarray, walk_length: int, restart_prob: float,
    num_walks: int, num_neighbors: int, rng_seed: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(frontier_src, frontier_dst, weights) with zero-weight pads removed."""
    assert LIB is not None
    seeds = np.ascontiguousarray(seeds, np.int32)
    n = len(seeds)
    out_src = np.empty(n * num_neighbors, np.int32)
    out_w = np.empty(n * num_neighbors, np.float32)
    LIB.pinsage_frontier(
        np.ascontiguousarray(user_row_ptr, np.int64),
        np.ascontiguousarray(user_cols, np.int32),
        np.ascontiguousarray(item_row_ptr, np.int64),
        np.ascontiguousarray(item_cols, np.int32),
        seeds, n, walk_length, restart_prob, num_walks, num_neighbors,
        np.uint64(rng_seed & 0xFFFFFFFFFFFFFFFF),
        out_src, out_w,
    )
    dst = np.repeat(seeds.astype(np.int64), num_neighbors)
    keep = out_w > 0
    return out_src[keep].astype(np.int64), dst[keep], out_w[keep]


def walk_step(
    user_row_ptr, user_cols, item_row_ptr, item_cols,
    items: np.ndarray, rng_seed: int,
) -> np.ndarray:
    assert LIB is not None
    items = np.ascontiguousarray(items, np.int32)
    out = np.empty(len(items), np.int32)
    LIB.walk_step(
        np.ascontiguousarray(user_row_ptr, np.int64),
        np.ascontiguousarray(user_cols, np.int32),
        np.ascontiguousarray(item_row_ptr, np.int64),
        np.ascontiguousarray(item_cols, np.int32),
        items, len(items), np.uint64(rng_seed & 0xFFFFFFFFFFFFFFFF), out,
    )
    return out.astype(np.int64)
