"""audio_separator_tpu — TPU-native audio stem separation framework.

A ground-up JAX/XLA re-design with the capabilities of
nomadkaraoke/python-audio-separator: MDX, VR, Demucs v4, and MDXC
(TFC-TDF v3 / BS- & Mel-Band RoFormer) model families, model registry,
ensembling, chunked processing, CLI, and remote API — with all compute on
TPU via jit-compiled programs and audio I/O through a native C++ codec layer.
"""

__version__ = "0.1.0"
