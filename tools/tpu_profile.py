"""Capture a device trace of the flagship demix on TPU and summarise it."""
import sys, time, os
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from audio_separator_tpu.models.init_params import flagship_config, init_roformer_params
from audio_separator_tpu.models.roformer import apply_roformer
from audio_separator_tpu.ops.demix import overlap_add_demix
from audio_separator_tpu.ops.stft import hamming_window

cfg = flagship_config()
params = jax.device_put(jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16),
                                     init_roformer_params(cfg, seed=0)))
chunk = cfg.stft_hop_length * 800
step = chunk
sr = 44100

def model_fn(p, chunks):
    out = apply_roformer(p, cfg, chunks, compute_dtype=jnp.bfloat16)
    return out[..., : chunks.shape[-1]]

rng = np.random.default_rng(0)
mix = (rng.standard_normal((2, 60 * sr)) * 0.1).astype(np.float32)
window = np.asarray(hamming_window(chunk))

def run():
    return overlap_add_demix(model_fn, mix, chunk, step, window,
                             num_stems=cfg.num_stems, batch_size=2,
                             model_params=params, quantized_transfer=True)

t0 = time.time()
run()
print(f"warm/compile {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
run()
print(f"steady {time.time()-t0:.1f}s for 60s audio", flush=True)

os.system("rm -rf /tmp/tputrace")
with jax.profiler.trace("/tmp/tputrace"):
    run()
print("trace captured", flush=True)
