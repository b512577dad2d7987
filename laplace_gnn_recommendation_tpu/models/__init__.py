"""Model layer: LightGCN, heterogeneous SAGE encoder-decoder, PinSAGE."""

from .lightgcn import (  # noqa: F401
    LightGCNParams,
    bpr_loss,
    init_lightgcn,
    lightgcn_forward,
)
