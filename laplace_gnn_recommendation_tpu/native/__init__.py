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
    lib.common_items_matches.restype = None
    lib.common_items_matches.argtypes = [
        i64p, i32p, i64p, i32p,
        i32p, ctypes.c_int64, ctypes.c_int32, i32p,
    ]
    lib.walk_step.restype = None
    lib.walk_step.argtypes = [
        i64p, i32p, i64p, i32p,
        i32p, ctypes.c_int64, ctypes.c_uint64, i32p,
    ]
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.assemble_train_batch.restype = ctypes.c_int64
    lib.assemble_train_batch.argtypes = [
        i64p, i32p, i64p, i32p,
        ctypes.c_int64, ctypes.c_int64,
        i32p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.c_double, ctypes.c_double, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int64,
        ctypes.c_uint64,
        i32p, ctypes.c_int64,     # eval_cands [B, W], cand_width (0=train)
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        i32p, i32p, u8p, u8p,
        i32p, i32p, u8p,
        i32p, i32p, f32p, u8p, i32p,
        i32p, i32p, i32p, i32p,
        i32p, i32p, i64p, i64p, ctypes.c_int64,
        i64p,
    ]
    return lib


LIB = _load()

_SANITIZE_FLAGS = {
    "asan": ["-fsanitize=address,undefined", "-fno-sanitize-recover=all"],
    # libgomp is not TSAN-instrumented (its fork-join hand-off reads as a
    # race on the capture struct); the TSAN build swaps the OpenMP regions
    # for the std::thread pool in sampler.cpp, which TSAN sees fully
    "tsan": ["-fsanitize=thread", "-DSAMPLER_STD_THREADS"],
}


def run_sanitizer_check(mode: str = "asan", timeout: float = 600.0):
    """Build sampler.cpp + sanitize_check.cpp under a sanitizer and run the
    standalone driver (SURVEY §5: the reference has no native code and needs
    no sanitizers; this build does — OpenMP BFS/walk/assembly over shared
    generation-stamped scratch).

    ``mode``: ``asan`` (ASAN+UBSAN) or ``tsan`` (the OpenMP paths). Returns
    (ok, output). A standalone binary, not an LD_PRELOAD into Python, so the
    runtimes initialize cleanly and OpenMP runs exactly as in production.
    """
    flags = _SANITIZE_FLAGS[mode]
    driver = os.path.join(_DIR, "sanitize_check.cpp")
    os.makedirs(_BUILD, exist_ok=True)
    exe = os.path.join(_BUILD, f"sanitize_check_{mode}")
    cmd = [
        "g++", "-O1", "-g", "-fopenmp", "-fPIC", *flags,
        _SRC, driver, "-o", exe,
    ]
    build = subprocess.run(cmd, capture_output=True, text=True)
    if build.returncode != 0:
        return False, f"build failed:\n{build.stderr}"
    env = dict(os.environ)
    env.setdefault("ASAN_OPTIONS", "detect_leaks=1")
    # bound OpenMP so TSAN's shadow memory stays reasonable
    env.setdefault("OMP_NUM_THREADS", "4")
    run = subprocess.run(
        [exe], capture_output=True, text=True, timeout=timeout, env=env
    )
    out = run.stdout + run.stderr
    return run.returncode == 0, out

# Persistent slot/stamp scratch for assemble_train_batch, held in
# threading.local storage (one set per live thread, garbage-collected with
# the thread — sampler workers spawned per epoch don't accumulate ~35 MB
# entries forever). Generation stamping lets the C side skip the O(V)
# per-call clear: a slot entry is valid only when its stamp equals the
# call's generation, and concurrent workers stamp their own arrays.
import threading as _threading

_ASM_TLS = _threading.local()


def _asm_scratch(num_users: int, num_items: int) -> dict:
    store = getattr(_ASM_TLS, "store", None)
    if store is None:
        store = _ASM_TLS.store = {}
    key = (num_users, num_items)
    sc = store.get(key)
    if sc is None:
        sc = store[key] = dict(
            uslot=np.empty(num_users, np.int32),
            islot=np.empty(num_items, np.int32),
            ustamp=np.zeros(num_users, np.int64),
            istamp=np.zeros(num_items, np.int64),
            gen=0,
        )
    sc["gen"] += 1  # unique per call; stamps start at 0 so gen starts at 1
    return sc


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


def assemble_train_batch(
    user_row_ptr, user_cols, item_row_ptr, item_cols,
    num_users: int, num_items: int,
    seeds: np.ndarray, n_hops: int, num_neighbors: int,
    pos_ratio: float, neg_ratio: float, k: int,
    id_max: int, total_edges: int, rng_seed: int,
    num_user_slots: int, num_item_slots: int, num_edges: int,
    labels_per_user: int, gt_per_user: int,
    eval_cands=None,
):
    """One native call → all padded batch arrays, or None when a budget
    would overflow (caller falls back to the Python path).

    ``eval_cands`` ([B, W] int32, -1 pads) switches the negatives to the
    EVAL semantics: matcher candidates XOR positives (count-one), the
    reference's ``data/dataset.py:93-106``. ``None`` = train (random
    negatives)."""
    assert LIB is not None
    seeds = np.ascontiguousarray(seeds, np.int32)
    b = len(seeds)
    if eval_cands is None:
        cand_arr = np.zeros((b, 1), np.int32)
        cand_width = 0
    else:
        cand_arr = np.ascontiguousarray(eval_cands, np.int32)
        assert cand_arr.shape[0] == b
        cand_width = cand_arr.shape[1]
    out = dict(
        user_ids=np.empty(num_user_slots, np.int32),
        item_ids=np.empty(num_item_slots, np.int32),
        user_mask=np.empty(num_user_slots, np.uint8),
        item_mask=np.empty(num_item_slots, np.uint8),
        edge_src=np.empty(num_edges, np.int32),
        edge_dst=np.empty(num_edges, np.int32),
        edge_mask=np.empty(num_edges, np.uint8),
        label_src=np.empty((b, labels_per_user), np.int32),
        label_dst=np.empty((b, labels_per_user), np.int32),
        label=np.empty((b, labels_per_user), np.float32),
        label_mask=np.empty((b, labels_per_user), np.uint8),
        label_item_global=np.empty((b, labels_per_user), np.int32),
        gt_items=np.empty((b, gt_per_user), np.int32),
        gt_count=np.empty(b, np.int32),
        seed_slots=np.empty(b, np.int32),
        seeds_out=np.empty(b, np.int32),
    )
    stats = np.zeros(1, np.int64)
    sc = _asm_scratch(num_users, num_items)
    rc = LIB.assemble_train_batch(
        np.ascontiguousarray(user_row_ptr, np.int64),
        np.ascontiguousarray(user_cols, np.int32),
        np.ascontiguousarray(item_row_ptr, np.int64),
        np.ascontiguousarray(item_cols, np.int32),
        num_users, num_items,
        seeds, b, n_hops, num_neighbors,
        float(pos_ratio), float(neg_ratio), int(k),
        int(id_max), int(total_edges),
        np.uint64(rng_seed & 0xFFFFFFFFFFFFFFFF),
        cand_arr, cand_width,
        num_user_slots, num_item_slots, num_edges,
        labels_per_user, gt_per_user,
        out["user_ids"], out["item_ids"], out["user_mask"], out["item_mask"],
        out["edge_src"], out["edge_dst"], out["edge_mask"],
        out["label_src"], out["label_dst"], out["label"],
        out["label_mask"], out["label_item_global"],
        out["gt_items"], out["gt_count"],
        out["seed_slots"], out["seeds_out"],
        sc["uslot"], sc["islot"], sc["ustamp"], sc["istamp"], sc["gen"],
        stats,
    )
    if rc != 0:
        return None
    out["label_truncations"] = int(stats[0])
    return out


def common_items_matches(
    user_row_ptr, user_cols, item_row_ptr, item_cols,
    users: np.ndarray, k: int,
) -> np.ndarray:
    """Batched collaborative 2-hop candidates, [B, k] int32 (-1 pads) —
    the native fast path of ``matchers.UsersWithCommonItemsMatcher``."""
    assert LIB is not None
    users = np.ascontiguousarray(users, np.int32)
    out = np.empty((len(users), k), np.int32)
    LIB.common_items_matches(
        np.ascontiguousarray(user_row_ptr, np.int64),
        np.ascontiguousarray(user_cols, np.int32),
        np.ascontiguousarray(item_row_ptr, np.int64),
        np.ascontiguousarray(item_cols, np.int32),
        users, len(users), int(k), out,
    )
    return out


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
