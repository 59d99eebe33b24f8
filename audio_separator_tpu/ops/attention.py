"""Attention dispatch: Pallas flash attention on TPU, einsum elsewhere.

The RoFormer time-transformer attends over ~800 STFT frames × dozens of band
sequences; materialising the (seq, seq) score tensors is the dominant HBM
traffic in the whole model (≈1.3 GB/layer fp32 at flagship shapes). On TPU
the stock Pallas flash kernel (jax.experimental.pallas.ops.tpu.flash_attention)
keeps scores in VMEM tiles with online softmax. Sequences are padded to the
kernel's 128 block granularity and masked via segment ids; short sequences
(< 256) stay on the plain einsum path where flash has no payoff.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=1)
def _flash_available() -> bool:
    try:
        from jax.experimental.pallas.ops.tpu import flash_attention  # noqa: F401
    except Exception:
        return False
    dev = jax.devices()[0]
    return dev.platform == "tpu" or "tpu" in str(dev).lower()


def _einsum_attention(q, k, v, scale):
    sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                     preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    return jnp.einsum("bhij,bhjd->bhid", attn, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          scale: Optional[float] = None) -> jnp.ndarray:
    """Self-attention over (B, H, N, D) tensors; returns (B, H, N, D)."""
    n = q.shape[2]
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if n < 256 or not _flash_available():
        return _einsum_attention(q, k, v, scale)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    pad = (-n) % 128
    if pad:
        widths = [(0, 0), (0, 0), (0, pad), (0, 0)]
        q = jnp.pad(q, widths)
        k = jnp.pad(k, widths)
        v = jnp.pad(v, widths)
        # padded tokens live in their own segment → masked from real tokens
        seg = jnp.concatenate([
            jnp.zeros((q.shape[0], n), jnp.int32),
            jnp.ones((q.shape[0], pad), jnp.int32),
        ], axis=1)
        segment_ids = SegmentIds(q=seg, kv=seg)
    else:
        segment_ids = None

    n_padded = q.shape[2]
    block = 128
    for candidate in (512, 256):
        if n_padded % candidate == 0:
            block = candidate
            break
    block_sizes = BlockSizes(
        block_q=block, block_k_major=block, block_k=block, block_b=1,
        block_q_major_dkv=block, block_k_major_dkv=block,
        block_k_dkv=block, block_q_dkv=block,
        block_k_major_dq=block, block_k_dq=block, block_q_dq=block,
    )
    out = flash_attention(q, k, v, segment_ids=segment_ids, causal=False,
                          sm_scale=scale, block_sizes=block_sizes)
    if pad:
        out = out[:, :, :n]
    return out.astype(q.dtype)
