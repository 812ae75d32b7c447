"""Pallas fused attention for the encoder's global blocks.

The hot path is softmax(q~ @ k~^T) @ v where q~/k~ already carry the
decomposed rel-pos bias as extra contraction dims (see models/vit.py). The
XLA path materializes the (N, N) fp32 score matrix in HBM; this kernel keeps
scores + probabilities entirely in VMEM (N=1024, fp32 scores = 4 MB/program)
— one program per (batch, head).

Differentiable via custom_vjp: the backward pass recomputes scores with
plain XLA ops (training batches are small; inference never differentiates).
Falls back to interpret mode off-TPU so CPU tests exercise the same code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flash_kernel(q_ref, k_ref, v_ref, o_ref):
    # blocks: q/k (1, N, D), v (1, N, dv), o (1, N, dv)
    q = q_ref[0]
    k = k_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (N, N) f32, VMEM
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    )
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _flash_forward(q, k, v, interpret: bool):
    B, H, N, D = q.shape
    dv = v.shape[-1]
    qf = q.reshape(B * H, N, D)
    kf = k.reshape(B * H, N, D)
    vf = v.reshape(B * H, N, dv)
    out = pl.pallas_call(
        _flash_kernel,
        out_shape=jax.ShapeDtypeStruct((B * H, N, dv), v.dtype),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, dv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, N, dv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, N, dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, interpret: bool = False):
    """softmax(q @ k^T) @ v with scores resident in VMEM.

    Args:
      q, k: [B, H, N, D] (bias already folded into extra dims of D).
      v: [B, H, N, dv].
    """
    return _flash_forward(q, k, v, interpret)


def _fwd(q, k, v, interpret):
    return _flash_forward(q, k, v, interpret), (q, k, v)


def _bwd(interpret, res, g):
    # XLA recompute backward (training-only path).
    q, k, v = res
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("bhnm,bhnc->bhmc", p, g32)
    dp = jnp.einsum("bhnc,bhmc->bhnm", g32, v32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhnm,bhmd->bhnd", ds, k.astype(jnp.float32))
    dk = jnp.einsum("bhnm,bhnd->bhmd", ds, q.astype(jnp.float32))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


fused_attention.defvjp(_fwd, _bwd)


def use_pallas() -> bool:
    """Pallas-compiled path only on TPU; interpret elsewhere."""
    return jax.default_backend() == "tpu"
