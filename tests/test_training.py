"""Fine-tuning step: loss decreases, shardings hold under dp×tp."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from audio_separator_tpu.models.init_params import init_roformer_params
from audio_separator_tpu.models.roformer import RoformerConfig
from audio_separator_tpu.parallel.mesh import make_mesh
from audio_separator_tpu.training import make_train_step

CFG = RoformerConfig(
    kind="bs", dim=32, depth=1, stereo=True, num_stems=2,
    time_transformer_depth=1, freq_transformer_depth=1,
    freqs_per_bands=(2, 2, 4, 8, 16, 32, 64, 129),
    dim_head=8, heads=4, stft_n_fft=512, stft_hop_length=128,
    stft_win_length=512, mask_estimator_depth=1,
)
CHUNK = CFG.stft_hop_length * 15
LOSS_KW = dict(stft_n_fft=256, window_sizes=(256, 128), hop_length=64)


def _data(batch, seed=0):
    rng = np.random.default_rng(seed)
    mix = rng.standard_normal((batch, 2, CHUNK)).astype(np.float32) * 0.2
    target = rng.standard_normal(
        (batch, CFG.num_stems, 2, CHUNK)).astype(np.float32) * 0.2
    # make it learnable: targets correlated with the mix
    target = 0.5 * target + 0.5 * mix[:, None]
    return jnp.asarray(mix), jnp.asarray(target)


def test_loss_decreases_single_device():
    params = init_roformer_params(CFG, seed=0)
    step, opt_state = make_train_step(CFG, optax.adam(3e-3), params, **LOSS_KW)
    mix, target = _data(2)
    losses = []
    for _ in range(6):
        params, opt_state, loss = step(params, opt_state, mix, target)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.98, losses


def test_sharded_training_matches_and_keeps_layout():
    mesh = make_mesh(n_devices=4, tp=2)
    params = init_roformer_params(CFG, seed=0)

    step_s, opt_s = make_train_step(CFG, optax.sgd(1e-2), params, mesh=mesh,
                                    **LOSS_KW)
    step_r, opt_r = make_train_step(CFG, optax.sgd(1e-2), params, **LOSS_KW)

    mix, target = _data(4, seed=1)
    p_s = jax.tree.map(jnp.asarray, params)
    p_r = jax.tree.map(jnp.asarray, params)
    for i in range(3):
        p_s, opt_s, loss_s = step_s(p_s, opt_s, mix, target)
        p_r, opt_r, loss_r = step_r(p_r, opt_r, mix, target)
        np.testing.assert_allclose(float(loss_s), float(loss_r),
                                   rtol=2e-4, err_msg=f"step {i}")
    # updated params numerically match the replicated run...
    flat_s = jax.tree.leaves(p_s)
    flat_r = jax.tree.leaves(p_r)
    for a, b in zip(flat_s, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    # ...and at least one large weight is genuinely TP-sharded (not replicated)
    sharded_leaves = [a for a in flat_s
                     if not a.sharding.is_fully_replicated and a.ndim >= 2]
    assert sharded_leaves, "no parameter kept a TP sharding after updates"
