"""Fused RoFormer attention block as one Pallas TPU kernel.

The device trace of the flagship demix showed the transformer stack dominated
not by MXU matmuls but by layout traffic around them: the qkv head-split
transpose, per-layer pad/slice of the sequence axis, the einsum-softmax
score materialisation (freq attention), and residual adds fused with layout
conversions (`add_add_fusion` on transposed outputs). This kernel keeps one
group of sequences VMEM-resident and performs

    rmsnorm -> qkv matmul -> head split -> RoPE -> scores -> masked softmax
    -> PV -> sigmoid gate -> output projection -> residual add

with zero HBM round-trips for any intermediate (ref semantics:
uvr_lib_v5/roformer/bs_roformer.py Attention + Transformer residual).

The feedforward half of the block stays in XLA — it is two big matmuls and a
GELU that XLA already fuses well, and keeping it out leaves the kernel's
VMEM budget comfortable (scores are the large term: n_pad^2 fp32).

Sequences are padded to the 128-lane granularity once by the caller
(`n_valid` masks the key columns); several (batch-fold) sequences are
processed per grid cell (`group`) so cell pipeline overhead amortises.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _layer_kernel(x_ref, wqkv_ref, gate_w_ref, gate_b_ref, wo_ref,
                  norm_ref, cos_ref, sin_ref, rot_ref, o_ref,
                  *, heads, dim_head, n_valid, use_rope, group):
    d_model = x_ref.shape[-1]
    scale_norm = d_model ** 0.5
    scale_attn = dim_head ** -0.5
    n_pad = x_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    if use_rope:
        cos = cos_ref[...]
        sin = sin_ref[...]

    for g in range(group):
        xg = x_ref[g]  # (n_pad, d) bf16
        xf = xg.astype(jnp.float32)
        ssq = jnp.sum(xf * xf, axis=-1, keepdims=True)
        xn32 = xf * jax.lax.rsqrt(jnp.maximum(ssq, 1e-24)) * scale_norm
        xn = (xn32 * norm_ref[...]).astype(xg.dtype)

        qkv = jax.lax.dot(
            xn, wqkv_ref[...], preferred_element_type=jnp.float32
        ).astype(xg.dtype)  # (n_pad, 3*h*dh); cols = [q_h0..q_hH, k_*, v_*]
        hd = heads * dim_head

        gates = jax.nn.sigmoid(
            jax.lax.dot(xn, gate_w_ref[...],
                        preferred_element_type=jnp.float32)
            + gate_b_ref[...]
        )  # (n_pad, heads) f32

        out_heads = []
        for h in range(heads):
            q = qkv[:, h * dim_head : (h + 1) * dim_head]
            k = qkv[:, hd + h * dim_head : hd + (h + 1) * dim_head]
            v = qkv[:, 2 * hd + h * dim_head : 2 * hd + (h + 1) * dim_head]
            if use_rope:
                # rotate_half as a (dh, dh) signed-permutation matmul — MXU-
                # friendly, avoids sub-lane reshapes inside the kernel
                # (rotary_embedding_torch interleaved-pair convention).
                rotm = rot_ref[...]
                q = q * cos + jax.lax.dot(
                    q, rotm, preferred_element_type=jnp.float32
                ).astype(q.dtype) * sin
                k = k * cos + jax.lax.dot(
                    k, rotm, preferred_element_type=jnp.float32
                ).astype(k.dtype) * sin
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale_attn
            if n_valid < n_pad:
                s = jnp.where(col < n_valid, s, -1e30)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=1, keepdims=True)
            o = jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )  # (n_pad, dh) f32
            out_heads.append(o * gates[:, h : h + 1])
        merged = jnp.concatenate(out_heads, axis=-1).astype(xg.dtype)
        proj = jax.lax.dot(
            merged, wo_ref[...], preferred_element_type=jnp.float32
        ).astype(xg.dtype)
        o_ref[g] = xg + proj


def _erf32(x):
    """erf for fp32 inside Mosaic kernels (erf/erfc primitives are not
    lowered for TPU Pallas): Abramowitz & Stegun 7.1.26, |error| < 1.5e-7 —
    far below bf16 activation precision and the parity-test tolerance."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    """GELU(x) = x/2 · (1 + erf(x/√2)) (torch.nn.GELU default, matching the
    reference FeedForward), with the in-kernel erf above."""
    return 0.5 * x * (1.0 + _erf32(x * np.float32(1.0 / np.sqrt(2.0))))


def _ff_kernel(x_ref, norm_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
               *, group):
    """x + ff(rmsnorm(x)); ff = GELU(x w1 + b1) w2 + b2 (exact erf GELU,
    matching torch.nn.GELU / the reference FeedForward)."""
    d_model = x_ref.shape[-1]
    scale_norm = d_model ** 0.5
    for g in range(group):
        xg = x_ref[g]
        xf = xg.astype(jnp.float32)
        ssq = jnp.sum(xf * xf, axis=-1, keepdims=True)
        xn = (xf * jax.lax.rsqrt(jnp.maximum(ssq, 1e-24)) * scale_norm
              * norm_ref[...]).astype(xg.dtype)
        h = jax.lax.dot(
            xn, w1_ref[...], preferred_element_type=jnp.float32
        ) + b1_ref[...]
        h = _gelu_exact(h).astype(xg.dtype)
        y = jax.lax.dot(
            h, w2_ref[...], preferred_element_type=jnp.float32
        ) + b2_ref[...]
        o_ref[g] = xg + y.astype(xg.dtype)


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def fused_ff_block(
    x: jnp.ndarray,  # (B, n_pad, d)
    ff_norm: jnp.ndarray,  # (d,)
    w1: jnp.ndarray,  # (d, hidden)
    b1: jnp.ndarray,  # (hidden,)
    w2: jnp.ndarray,  # (hidden, d)
    b2: jnp.ndarray,  # (d,)
    group: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + FeedForward(rmsnorm(x)) in one Pallas launch."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n_pad, d = x.shape
    hidden = w1.shape[-1]
    vmem_limit = 40 * 1024 * 1024
    if group is None:
        weights = 2 * (w1.size + w2.size)
        # x/xn/out + fp32 copy + double-buffered IO + the (n_pad, hidden)
        # activations in bf16 and fp32.
        per_seq = 8 * 2 * n_pad * d + 3 * 2 * n_pad * hidden + 4 * n_pad * hidden
        budget = int(vmem_limit * 0.85) - weights
        group = max(1, min(16, budget // max(per_seq, 1)))
    while b % group:
        group -= 1

    kernel = functools.partial(_ff_kernel, group=group)
    seq_spec = pl.BlockSpec((group, n_pad, d), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def whole(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    try:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)
    except AttributeError:  # older jax spelling
        compiler_params = pltpu.TPUCompilerParams(vmem_limit_bytes=vmem_limit)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b // group,),
        in_specs=[seq_spec, whole(ff_norm), whole(w1), whole(b1), whole(w2),
                  whole(b2)],
        out_specs=seq_spec,
        compiler_params=compiler_params,
        interpret=interpret,
    )(x, ff_norm, w1, b1, w2, b2)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "n_valid", "group", "interpret"),
)
def fused_attention_block(
    x: jnp.ndarray,  # (B, n_pad, d) — n_pad % 128 == 0, batch-folded seqs
    wqkv: jnp.ndarray,  # (d, 3*heads*dh)
    gate_w: jnp.ndarray,  # (d, heads)
    gate_b: jnp.ndarray,  # (heads,)
    wo: jnp.ndarray,  # (heads*dh, d)
    attn_norm: jnp.ndarray,  # (d,)
    rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]],  # (n_pad, dh) each
    heads: int,
    n_valid: int,
    group: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + gated-MHA(rmsnorm(x)) in one Pallas launch; returns same shape."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n_pad, d = x.shape
    # Tokens are the sublane dim of the in-kernel matmuls (granularity 8 fp32
    # / 16 bf16); 64 keeps short freq-band sequences at half the padded work
    # of a full 128-lane tile.
    assert n_pad % 64 == 0, "caller pads the sequence axis to a 64-multiple"
    dh = wqkv.shape[-1] // (3 * heads)

    # The kernel's working set at flagship time-attention shapes (n_pad=896,
    # d=512) is ~17 MB at group=1 — above the 16 MB default scoped-vmem
    # limit, well under physical VMEM. Raise the limit and budget groups
    # against it.
    vmem_limit = 40 * 1024 * 1024
    if group is None:
        weights = 2 * (wqkv.size + wo.size + gate_w.size)
        scores = 2 * 4 * n_pad * n_pad
        per_seq = 10 * 2 * n_pad * d + scores
        budget = int(vmem_limit * 0.85) - weights
        group = max(1, min(16, budget // max(per_seq, 1)))
    while b % group:
        group -= 1

    use_rope = rope is not None
    cos, sin = (rope if use_rope
                else (jnp.zeros((n_pad, dh), x.dtype),) * 2)
    # rotate_half(x) = x @ rot: out[2k] = -x[2k+1], out[2k+1] = x[2k].
    import numpy as np

    rot_np = np.zeros((dh, dh), np.float32)
    for i in range(0, dh, 2):
        rot_np[i + 1, i] = -1.0
        rot_np[i, i + 1] = 1.0
    rot = jnp.asarray(rot_np, x.dtype)

    kernel = functools.partial(
        _layer_kernel, heads=heads, dim_head=dh, n_valid=n_valid,
        use_rope=use_rope, group=group)
    seq_spec = pl.BlockSpec((group, n_pad, d), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def whole(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    try:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)
    except AttributeError:  # older jax spelling
        compiler_params = pltpu.TPUCompilerParams(vmem_limit_bytes=vmem_limit)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b // group,),
        in_specs=[seq_spec, whole(wqkv), whole(gate_w), whole(gate_b),
                  whole(wo), whole(attn_norm), whole(cos), whole(sin),
                  whole(rot)],
        out_specs=seq_spec,
        compiler_params=compiler_params,
        interpret=interpret,
    )(x, wqkv, gate_w, gate_b, wo, attn_norm, cos, sin, rot)
