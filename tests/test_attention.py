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


def test_dispatch_small_seq_uses_einsum():
    q = jnp.ones((1, 2, 32, 16))
    out = dot_product_attention(q, q, q)
    assert out.shape == (1, 2, 32, 16)


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
