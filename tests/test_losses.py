"""Multi-resolution STFT training-loss parity vs the torch formula
(ref: bs_roformer.py:519-562)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from audio_separator_tpu.ops.losses import (multi_res_stft_loss,
                                            roformer_training_loss)


def _torch_loss(recon, target, stft_n_fft=2048,
                window_sizes=(4096, 2048, 1024, 512, 256), hop=147):
    """(l1, multi-res) per the reference formula; complex L1 = mean |a−b|."""
    recon_t = torch.from_numpy(recon)
    target_t = torch.from_numpy(target)[..., : recon.shape[-1]]
    loss = F.l1_loss(recon_t, target_t)
    multi = 0.0
    for w in window_sizes:
        n_fft = max(w, stft_n_fft)
        kw = dict(n_fft=n_fft, win_length=w, hop_length=hop,
                  window=torch.hann_window(w), return_complex=True)
        ry = torch.stft(recon_t.reshape(-1, recon_t.shape[-1]), **kw)
        ty = torch.stft(target_t.reshape(-1, target_t.shape[-1]), **kw)
        multi = multi + (ry - ty).abs().mean()
    return float(loss), float(multi)


def test_multi_res_stft_loss_matches_torch():
    rng = np.random.default_rng(0)
    recon = rng.standard_normal((2, 2, 2, 8192)).astype(np.float32) * 0.3
    target = rng.standard_normal((2, 2, 2, 8200)).astype(np.float32) * 0.3

    ref_l1, ref_multi = _torch_loss(recon, target)
    total, (base, multi) = roformer_training_loss(
        jnp.asarray(recon), jnp.asarray(target))
    np.testing.assert_allclose(float(base), ref_l1, rtol=1e-5)
    np.testing.assert_allclose(float(multi), ref_multi, rtol=1e-4)
    np.testing.assert_allclose(float(total), ref_l1 + ref_multi, rtol=1e-4)


def test_loss_is_differentiable():
    import jax

    rng = np.random.default_rng(1)
    recon = jnp.asarray(rng.standard_normal((1, 2, 4096)).astype(np.float32))
    target = jnp.asarray(rng.standard_normal((1, 2, 4096)).astype(np.float32))

    def f(x):
        total, _ = roformer_training_loss(x, target, window_sizes=(512, 256))
        return total

    g = jax.grad(f)(recon)
    assert g.shape == recon.shape and np.isfinite(np.asarray(g)).all()
