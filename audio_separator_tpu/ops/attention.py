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


def _fused_attention_kernel(q_ref, k_ref, v_ref, o_ref, *, n_valid, scale, group):
    """One cell = `group` (batch·head) sequences: whole-sequence attention in
    VMEM.

    At this model's sequence lengths (≤ ~1300 frames) the full score tile
    fits on-chip (896² fp32 ≈ 3.2 MB), so no online softmax is needed —
    one QKᵀ, one masked softmax, one PV, all without touching HBM for the
    scores. Several heads are processed per grid cell so per-cell pipeline
    overhead amortises (a 1-head grid of ~1000 tiny cells is overhead-bound).
    """
    col = jax.lax.broadcasted_iota(jnp.int32, (q_ref.shape[1], q_ref.shape[1]), 1)
    for g in range(group):
        q = q_ref[g]
        k = k_ref[g]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if n_valid < s.shape[1]:
            s = jnp.where(col < n_valid, s, -1e30)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o_ref[g] = jax.lax.dot(
            p.astype(v_ref.dtype), v_ref[g], preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


# Scoped-VMEM ceiling for the fused kernels. 48 MB (v5e has 128 MB/core):
# the round-5 shift-A/B sweep hit a hard 40.9M allocation at htdemucs
# batch 8 under the old 40 MB limit (SHIFT_AB.json len60s_b8) — the extra
# headroom admits that compile without changing any production shape's
# implementation choice (_whole_seq_fits flips only for 1594 < n_pad ≤ 1844,
# a band no supported geometry occupies).
_VMEM_LIMIT = 48 * 1024 * 1024


def _whole_seq_fits(n: int, d: int) -> bool:
    """Can the whole-sequence kernel hold one sequence's working set in VMEM
    (``_VMEM_LIMIT``, 48 MB scoped)? Three (n_pad, n_pad) temporaries
    dominate: two fp32 score tensors plus the int32 key-column mask iota."""
    n_pad = n + (-n) % 128
    per_seq = 4 * 2 * n_pad * d * 2  # q/k/v/o, double-buffered, bf16
    return 3 * 4 * n_pad * n_pad + per_seq <= int(_VMEM_LIMIT * 0.85)


def _pallas_fused_attention(q, k, v, scale, group: Optional[int] = None,
                            interpret: bool = False):
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, n, d = q.shape
    pad = (-n) % 128
    n_pad = n + pad
    widths = [(0, 0), (0, 0), (0, pad), (0, 0)]
    if pad:
        q = jnp.pad(q, widths)
        k = jnp.pad(k, widths)
        v = jnp.pad(v, widths)
    bh = b * h
    if group is None:
        # Fit the raised VMEM limit: double-buffered q/k/v/o blocks + two
        # fp32 score-sized temporaries.
        budget = int(_VMEM_LIMIT * 0.85) - 2 * 4 * n_pad * n_pad
        per_seq = 4 * 2 * n_pad * d * 2  # 4 buffers, double-buffered, bf16
        group = max(1, min(8, budget // max(per_seq, 1)))
    while bh % group:
        group -= 1
    qf = q.reshape(bh, n_pad, d)
    kf = k.reshape(bh, n_pad, d)
    vf = v.reshape(bh, n_pad, d)

    kernel = ft.partial(_fused_attention_kernel, n_valid=n, scale=scale,
                        group=group)
    spec = pl.BlockSpec((group, n_pad, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    try:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    except AttributeError:  # older jax spelling
        compiler_params = pltpu.TPUCompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        grid=(bh // group,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        compiler_params=compiler_params,
        interpret=interpret,
    )(qf, kf, vf)
    out = out.reshape(b, h, n_pad, d)
    return out[:, :, :n] if pad else out


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          scale: Optional[float] = None,
                          force: Optional[str] = None) -> jnp.ndarray:
    """Self-attention over (B, H, N, D) tensors; returns (B, H, N, D).

    Implementation dispatch is overridable with ``force``
    (``einsum`` | ``pallas``, from ExecutionOptions.attn) for A/B perf work;
    default heuristic keeps short sequences on the fused-by-XLA einsum path
    and mid-length ones on the whole-sequence Pallas kernel.
    """
    n = q.shape[2]
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if force is None:
        from .exec_options import DEFAULT_EXEC

        force = DEFAULT_EXEC.attn
    if force == "einsum":
        return _einsum_attention(q, k, v, scale)
    if force == "pallas" and _flash_available():
        return _pallas_fused_attention(q, k, v, scale)
    # Default: the whole-seq Pallas kernel for every shape whose working set
    # (dominated by the two fp32 (n_pad, n_pad) score temporaries) fits the
    # raised VMEM limit — on the flagship forward A/B it beat the einsum path
    # for the long time axis AND the short (n=62, padded to 128) freq axis,
    # whose einsum-softmax chain materialised large fp32 score tensors
    # (486 ms vs 630 ms per 2×8 s chunk). Longer sequences (e.g. the
    # HTDemucs cross-transformer at ~10 s training segments, n ≈ 3400) fall
    # back to einsum rather than overflow VMEM.
    if n < 16 or not _whole_seq_fits(n, q.shape[-1]) or not _flash_available():
        return _einsum_attention(q, k, v, scale)
    return _pallas_fused_attention(q, k, v, scale)
