"""Self-adjoint whole-loop VJP for the LightGCN multi-scale propagation.

Replaces per-iteration autodiff of the K-hop diffusion loop (reference
``model/lightgcn.py:58-68``) with ONE custom VJP around the whole loop.

Math: one diffusion step is the stacked linear map M(u, i) = (Ã·i, Ãᵀ·u)
on (user, item) embeddings. For any (u, i, gᵤ, gᵢ):

    ⟨M(u,i), (gᵤ,gᵢ)⟩ = ⟨Ã i, gᵤ⟩ + ⟨Ãᵀ u, gᵢ⟩
                       = ⟨u, Ã gᵢ⟩ + ⟨i, Ãᵀ gᵤ⟩ = ⟨(u,i), M(gᵤ,gᵢ)⟩,

so **M is self-adjoint** (the two diffusion directions are mutual
transposes — true for every propagation tier, including the bf16 dense
pair, because elementwise bf16 rounding commutes with transposition). The
whole multi-scale loop L = (1/(K+1))·Σ_{k=0}^{K} M^k is then self-adjoint
too, and its VJP is simply L applied to the cotangents:

    ∂/∂(u₀,i₀) ⟨L(u₀,i₀), g⟩ = L(g).

Why this matters on TPU: autodiff of the unrolled loop runs the same 2K
segment-sums on the cotangents but interleaves them with per-iteration
cotangent-accumulation chains and (for custom-VJP tiers) per-iteration
zero-cotangent materialization for the plan operands — measured 1.75× the
forward cost at H&M scale (ROOFLINE.json r4). With this wrapper the
backward IS the forward code path: identical kernels, identical cost, no
residuals (the operator is linear — nothing to checkpoint), so the K-loop's
live set stays one message block regardless of K.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def multiscale_loop(
    propagate: Callable,
    operand,
    user_emb0: jnp.ndarray,
    item_emb0: jnp.ndarray,
    num_iterations: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(1/(K+1))·Σ_k M^k applied to (u₀, i₀) — the plain loop body."""
    acc_u, acc_i = user_emb0, item_emb0
    eu, ei = user_emb0, item_emb0
    for _ in range(num_iterations):
        eu, ei = propagate(operand, eu, ei)
        acc_u = acc_u + eu
        acc_i = acc_i + ei
    scale = 1.0 / (num_iterations + 1)
    return acc_u * scale, acc_i * scale


def self_adjoint_multiscale(
    propagate: Callable,
    operand,
    user_emb0: jnp.ndarray,
    item_emb0: jnp.ndarray,
    num_iterations: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-scale K-loop with the self-adjoint whole-loop VJP.

    ``operand`` (the adjacency in whatever tier's layout) rides as an
    explicit custom-VJP argument — it may be a jit ARGUMENT tracer at the
    call site (the production steps pass the plan arrays as arguments, not
    closure constants, to keep them out of the HLO literal pool), and
    custom_vjp cannot close over tracers. Its cotangent is a single zero
    tree (graph data is never a trainable; XLA DCEs it), emitted ONCE per
    whole loop instead of once per iteration per direction.
    """

    def _zero_ct(x):
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            return jnp.zeros_like(x)
        import numpy as _np

        return _np.zeros(_np.shape(x), dtype=jax.dtypes.float0)

    @jax.custom_vjp
    def loop(op, u0, i0):
        return multiscale_loop(propagate, op, u0, i0, num_iterations)

    def loop_fwd(op, u0, i0):
        return loop(op, u0, i0), op  # linear: the only residual is the plan

    def loop_bwd(op, cts):
        g_u, g_i = cts
        # Lᵀ = L: the backward is one forward on the cotangents
        gu0, gi0 = multiscale_loop(propagate, op, g_u, g_i, num_iterations)
        return jax.tree.map(_zero_ct, op), gu0, gi0

    loop.defvjp(loop_fwd, loop_bwd)
    return loop(operand, user_emb0, item_emb0)
