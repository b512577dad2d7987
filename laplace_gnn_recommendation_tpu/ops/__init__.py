"""TPU-native compute ops.

These are the first-class replacements for the native kernels the reference
dispatches into via its dependency stack (SURVEY §2b): torch_sparse SpMM,
PyG scatter/gather aggregation, structured negative sampling, full-catalog
top-k, and dense embedding lookups — all re-designed for XLA/Pallas with
static shapes.
"""

from .spmm import lightgcn_propagate, propagate_bipartite  # noqa: F401
from .metrics import (  # noqa: F401
    map_at_k,
    ndcg_at_k,
    recall_precision_at_k,
    topk_hits,
)
from .sampling import structured_negative_sampling, uniform_negative_sampling  # noqa: F401
from .topk import masked_topk, mips_topk, sharded_mips_topk  # noqa: F401
from .search import batched_membership, lower_bound  # noqa: F401
