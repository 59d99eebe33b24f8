"""Fused attention kernel correctness (interpret mode on CPU) vs einsum."""

import numpy as np
import pytest

import jax.numpy as jnp

from audio_separator_tpu.ops.attention import (
    _einsum_attention,
    _pallas_fused_attention,
    dot_product_attention,
)


@pytest.mark.parametrize("n", [100, 801])
@pytest.mark.parametrize("group", [1, 4])
def test_pallas_kernel_matches_einsum(n, group):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 4, n, 64)).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.standard_normal((2, 4, n, 64)).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.standard_normal((2, 4, n, 64)).astype(np.float32) * 0.5)
    ref = np.asarray(_einsum_attention(q, k, v, 0.125))
    got = np.asarray(_pallas_fused_attention(q, k, v, 0.125, group=group,
                                             interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_dispatch_boundaries(monkeypatch):
    """n < 16 and VMEM-overflowing n stay on einsum; in-range n takes the
    Pallas kernel when the TPU backend is available."""
    from audio_separator_tpu.ops import attention as att

    calls = []
    monkeypatch.setattr(att, "_flash_available", lambda: True)
    monkeypatch.setattr(att, "_pallas_fused_attention",
                        lambda q, k, v, scale: calls.append(q.shape[2]) or
                        jnp.zeros_like(q))

    def run(n):
        q = jnp.ones((1, 2, n, 64))
        return att.dot_product_attention(q, q, q)

    run(8)          # below the minimum → einsum
    assert calls == []
    run(32)         # in range → kernel
    assert calls == [32]
    run(4096)       # score temporaries would blow the 40 MB VMEM limit
    assert calls == [32]
    assert att._whole_seq_fits(1536, 64) and not att._whole_seq_fits(2048, 64)


def test_pallas_kernel_freq_shape_matches_einsum():
    """Freq-attention shape (tiny n=62, huge fold) through the Pallas kernel —
    exercised when AUDSEP_ATTN=pallas forces tiny sequences off einsum."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((16, 8, 62, 64)).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.standard_normal((16, 8, 62, 64)).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.standard_normal((16, 8, 62, 64)).astype(np.float32) * 0.5)
    ref = np.asarray(_einsum_attention(q, k, v, 0.125))
    got = np.asarray(_pallas_fused_attention(q, k, v, 0.125, group=8,
                                             interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.parametrize("n,b,rope,group,gran", [
    (100, 4, True, 2, 128), (62, 6, False, 3, 128), (130, 2, True, 1, 128),
    (62, 6, True, 3, 64),  # freq-axis shape at the cheaper 64-row padding
])
def test_fused_attention_block_matches_reference(n, b, rope, group, gran):
    """Fused Pallas block (norm+qkv+RoPE+attn+gate+proj+residual) == the
    composed JAX ops, with sequence padding and key-column masking."""
    from audio_separator_tpu.models.roformer import _attention, _rope_tables
    from audio_separator_tpu.ops.attention_block import fused_attention_block

    d, h, dh = 64, 4, 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32) * 0.3)
    p = {
        "attn_norm": jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1 + 1.0),
        "wqkv": jnp.asarray(rng.standard_normal((d, 3 * h * dh)).astype(np.float32) * 0.05),
        "gate_w": jnp.asarray(rng.standard_normal((d, h)).astype(np.float32) * 0.05),
        "gate_b": jnp.asarray(rng.standard_normal(h).astype(np.float32) * 0.05),
        "wo": jnp.asarray(rng.standard_normal((h * dh, d)).astype(np.float32) * 0.05),
    }
    tables = _rope_tables(n, dh) if rope else None
    ref = np.asarray(x + _attention(p, x, h, tables))
    pad = (-n) % gran
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    rope_p = None
    if rope:
        rope_p = (jnp.pad(tables[0], ((0, pad), (0, 0))),
                  jnp.pad(tables[1], ((0, pad), (0, 0))))
    got = np.asarray(fused_attention_block(
        xp, p["wqkv"], p["gate_w"], p["gate_b"], p["wo"], p["attn_norm"],
        rope_p, h, n_valid=n, group=group, interpret=True))[:, :n]
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_fused_ff_block_matches_reference():
    """Fused Pallas FF block (norm+w1+GELU+w2+residual) == composed JAX ops."""
    from audio_separator_tpu.models.roformer import _feedforward
    from audio_separator_tpu.ops.attention_block import fused_ff_block

    b, n, d, hidden = 3, 128, 64, 256
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32) * 0.3)
    p = {
        "ff_norm": jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1 + 1.0),
        "ff_w1": jnp.asarray(rng.standard_normal((d, hidden)).astype(np.float32) * 0.05),
        "ff_b1": jnp.asarray(rng.standard_normal(hidden).astype(np.float32) * 0.05),
        "ff_w2": jnp.asarray(rng.standard_normal((hidden, d)).astype(np.float32) * 0.05),
        "ff_b2": jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.05),
    }
    ref = np.asarray(x + _feedforward(p, x))
    got = np.asarray(fused_ff_block(x, p["ff_norm"], p["ff_w1"], p["ff_b1"],
                                    p["ff_w2"], p["ff_b2"], group=3,
                                    interpret=True))
    np.testing.assert_allclose(got, ref, atol=3e-5)
