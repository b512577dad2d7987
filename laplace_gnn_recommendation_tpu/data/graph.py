"""Static-shape graph containers.

The reference keeps graphs as PyG ``HeteroData`` pickles plus per-user Python
adjacency dicts (``utils/preprocessing.py:9-89``, ``run_preprocessing.py:
176-195``). On TPU everything that touches the device must have a static
shape, so the canonical in-memory format here is array-of-struct:

* :class:`BipartiteGraph` — the device-side user↔item interaction graph as a
  padded COO edge list kept in **two sort orders** (user-major and
  item-major) so that *both* directions of message passing are sorted
  segment-sums (the TPU-friendly SpMM; see ``ops/spmm.py``). Symmetric
  ``gcn_norm`` edge weights are precomputed at build time (the reference
  recomputes ``gcn_norm`` every forward, ``model/lightgcn.py:56``).
* :class:`HostCSR` — host-side (numpy) CSR adjacency used by the neighbor
  sampler; never shipped to the device.
* :class:`HeteroGraph` — node-feature matrices per node type + a
  ``BipartiteGraph`` per edge type (replaces ``HeteroData``).

Pad discipline: padded edge slots carry ``weight == 0`` and point at row 0 /
col 0, so every segment-sum and gather treats them as harmless no-ops.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..types import EdgeType


def _round_up(x: int, m: int) -> int:
    return -(-max(x, 1) // m) * m


@dataclass
class BipartiteGraph:
    """Padded COO bipartite interaction graph (device-side, jittable pytree).

    Attributes
    ----------
    edge_user / edge_item : int32[E_pad]
        Edge endpoints sorted by (user, item). Pads point at (0, 0).
    edge_user_im / edge_item_im : int32[E_pad]
        The same edges sorted by (item, user) — the item-major ordering that
        makes the item-receiving direction of SpMM a sorted segment-sum.
    edge_w / edge_w_im : float32[E_pad]
        Symmetric-normalized weights 1/sqrt(deg_u * deg_i) in each ordering
        (``gcn_norm`` with add_self_loops=False, reference
        ``model/lightgcn.py:56``); exactly 0.0 on padded slots.
    user_deg / item_deg : int32
        True degrees (before normalization), used by samplers and metrics.
    """

    edge_user: jnp.ndarray
    edge_item: jnp.ndarray
    edge_w: jnp.ndarray
    edge_user_im: jnp.ndarray
    edge_item_im: jnp.ndarray
    edge_w_im: jnp.ndarray
    user_deg: jnp.ndarray
    item_deg: jnp.ndarray
    num_users: int = dataclasses.field(metadata=dict(static=True), default=0)
    num_items: int = dataclasses.field(metadata=dict(static=True), default=0)
    num_edges: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def num_edges_padded(self) -> int:
        return int(self.edge_user.shape[0])

    @staticmethod
    def from_edges(
        user_idx: np.ndarray,
        item_idx: np.ndarray,
        num_users: int,
        num_items: int,
        pad_multiple: int = 128,
    ) -> "BipartiteGraph":
        """Build from raw (user, item) interaction arrays (host side).

        Sorting, degree computation and normalization happen once in numpy;
        the result is uploaded as static-shape device arrays.
        """
        user_idx = np.asarray(user_idx, dtype=np.int32)
        item_idx = np.asarray(item_idx, dtype=np.int32)
        assert user_idx.shape == item_idx.shape
        e = int(user_idx.shape[0])
        e_pad = _round_up(e, pad_multiple)

        user_deg = np.bincount(user_idx, minlength=num_users).astype(np.int32)
        item_deg = np.bincount(item_idx, minlength=num_items).astype(np.int32)
        # gcn_norm: w_ui = 1/sqrt(deg_u * deg_i); isolated nodes get 0 weight.
        du = user_deg[user_idx].astype(np.float64)
        di = item_deg[item_idx].astype(np.float64)
        w = np.where((du > 0) & (di > 0), 1.0 / np.sqrt(np.maximum(du * di, 1.0)), 0.0)

        def _pack(order: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
            uu = np.zeros(e_pad, np.int32)
            ii = np.zeros(e_pad, np.int32)
            ww = np.zeros(e_pad, np.float32)
            uu[:e] = user_idx[order]
            ii[:e] = item_idx[order]
            ww[:e] = w[order]
            if e > 0:
                # pad segment ids repeat the LAST real ids so the sequence
                # stays non-decreasing — segment_sum is called with
                # indices_are_sorted=True, and a 0-padded tail after the
                # largest id would break that promise (weights stay 0, so
                # the pads still contribute nothing)
                uu[e:] = uu[e - 1]
                ii[e:] = ii[e - 1]
            return uu, ii, ww

        um_order = np.lexsort((item_idx, user_idx))
        im_order = np.lexsort((user_idx, item_idx))
        uu, ii, ww = _pack(um_order)
        uu2, ii2, ww2 = _pack(im_order)

        g = BipartiteGraph(
            edge_user=jnp.asarray(uu),
            edge_item=jnp.asarray(ii),
            edge_w=jnp.asarray(ww),
            edge_user_im=jnp.asarray(uu2),
            edge_item_im=jnp.asarray(ii2),
            edge_w_im=jnp.asarray(ww2),
            user_deg=jnp.asarray(user_deg),
            item_deg=jnp.asarray(item_deg),
            num_users=int(num_users),
            num_items=int(num_items),
            num_edges=e,
        )
        # host-side copies of the six edge arrays, kept OUTSIDE the dataclass
        # fields (so they are invisible to the pytree registration and jit).
        # Downstream plan builders (BlockedGraph, ShardedBipartiteGraph,
        # DenseAdjacency) consume these instead of a device→host download —
        # ~700 MB over the remote-device tunnel at H&M scale.
        g._host = (uu, ii, ww, uu2, ii2, ww2)
        return g

    def host_arrays(self):
        """(edge_user, edge_item, edge_w, edge_user_im, edge_item_im,
        edge_w_im) as numpy, UNPADDED — from the build-time cache when
        available, else one device→host transfer."""
        cached = getattr(self, "_host", None)
        e = self.num_edges
        if cached is not None:
            return tuple(a[:e] for a in cached)
        return (
            np.asarray(self.edge_user[:e]),
            np.asarray(self.edge_item[:e]),
            np.asarray(self.edge_w[:e]),
            np.asarray(self.edge_user_im[:e]),
            np.asarray(self.edge_item_im[:e]),
            np.asarray(self.edge_w_im[:e]),
        )

    def edges_host(self) -> Tuple[np.ndarray, np.ndarray]:
        """Return the true (unpadded) edge arrays on host, user-major order."""
        eu, ei, *_ = self.host_arrays()
        return eu, ei


jax.tree_util.register_dataclass(BipartiteGraph)


class HostCSR:
    """Host-side CSR adjacency for sampling (numpy only; replaces the
    reference's per-user Python dicts ``utils/preprocessing.py:84-89``).

    ``row_ptr[u]:row_ptr[u+1]`` slices ``cols`` to the sorted neighbors of
    ``u``. Built for both directions (user→items, item→users).
    """

    def __init__(self, row_ptr: np.ndarray, cols: np.ndarray, num_rows: int, num_cols: int):
        self.row_ptr = row_ptr
        self.cols = cols
        self.num_rows = num_rows
        self.num_cols = num_cols

    @staticmethod
    def from_edges(src: np.ndarray, dst: np.ndarray, num_rows: int, num_cols: int) -> "HostCSR":
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        order = np.lexsort((dst, src))
        src_s, dst_s = src[order], dst[order]
        counts = np.bincount(src_s, minlength=num_rows)
        row_ptr = np.zeros(num_rows + 1, dtype=np.int64)
        np.cumsum(counts, out=row_ptr[1:])
        return HostCSR(row_ptr, dst_s.astype(np.int32), num_rows, num_cols)

    def neighbors(self, row: int) -> np.ndarray:
        return self.cols[self.row_ptr[row] : self.row_ptr[row + 1]]

    def degree(self, row: int) -> int:
        return int(self.row_ptr[row + 1] - self.row_ptr[row])

    @property
    def degrees(self) -> np.ndarray:
        return np.diff(self.row_ptr)


@dataclass
class HeteroGraph:
    """Typed multi-relation graph: features per node type + a bipartite edge
    set per edge type. Replaces PyG ``HeteroData`` (``utils/preprocessing.py:
    9-40``) with plain arrays.

    ``node_features[t]`` is an int32 [N_t, F_t] categorical feature matrix
    (label-encoded, as produced by preprocessing); non-categorical features
    (e.g. CLIP embeddings, H&M ``run_preprocessing_fashion.py:129-162``) go
    in ``node_features_float[t]`` as float32 [N_t, D_t].
    """

    node_features: Dict[str, np.ndarray]
    edges: Dict[EdgeType, Tuple[np.ndarray, np.ndarray]]  # (src_idx, dst_idx)
    num_nodes: Dict[str, int]
    node_features_float: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)

    def csr(self, edge_type: EdgeType) -> HostCSR:
        s, d = self.edges[edge_type]
        return HostCSR.from_edges(s, d, self.num_nodes[edge_type.src], self.num_nodes[edge_type.dst])

    def csr_reverse(self, edge_type: EdgeType) -> HostCSR:
        s, d = self.edges[edge_type]
        return HostCSR.from_edges(d, s, self.num_nodes[edge_type.dst], self.num_nodes[edge_type.src])

    def bipartite(self, edge_type: EdgeType, pad_multiple: int = 128) -> BipartiteGraph:
        s, d = self.edges[edge_type]
        return BipartiteGraph.from_edges(
            s, d, self.num_nodes[edge_type.src], self.num_nodes[edge_type.dst],
            pad_multiple=pad_multiple,
        )


def save_hetero_graph(path: str, g: HeteroGraph) -> None:
    """Persist as a single .npz (replaces pickled ``.pt`` graph artifacts,
    reference ``run_preprocessing.py:176-189``)."""
    payload: Dict[str, np.ndarray] = {}
    meta_nodes = []
    for t, x in g.node_features.items():
        payload[f"x__{t}"] = x
        meta_nodes.append(t)
    for t, x in g.node_features_float.items():
        payload[f"xf__{t}"] = x
    for et, (s, d) in g.edges.items():
        key = f"{et.src}|{et.rel}|{et.dst}"
        payload[f"es__{key}"] = s
        payload[f"ed__{key}"] = d
    payload["__num_nodes_keys"] = np.array(list(g.num_nodes.keys()))
    payload["__num_nodes_vals"] = np.array(list(g.num_nodes.values()), dtype=np.int64)
    np.savez_compressed(path, **payload)


def load_hetero_graph(path: str) -> HeteroGraph:
    z = np.load(path, allow_pickle=False)
    node_features, node_features_float, edges = {}, {}, {}
    for k in z.files:
        if k.startswith("x__"):
            node_features[k[3:]] = z[k]
        elif k.startswith("xf__"):
            node_features_float[k[4:]] = z[k]
        elif k.startswith("es__"):
            src, rel, dst = k[4:].split("|")
            et = EdgeType(src, rel, dst)
            edges[et] = (z[k], z["ed__" + k[4:]])
    num_nodes = dict(
        zip([str(s) for s in z["__num_nodes_keys"]], [int(v) for v in z["__num_nodes_vals"]])
    )
    return HeteroGraph(node_features, edges, num_nodes, node_features_float)
