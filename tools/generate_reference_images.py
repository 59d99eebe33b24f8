#!/usr/bin/env python
"""Render golden waveform/spectrogram PNGs for image-based regression tests.

Counterpart of the reference's golden generators
(ref: tests/integration/generate_reference_images.py; mechanism described in
tests/README.md:36-60): every separated stem is rendered as a log-magnitude
spectrogram and a min/max-envelope waveform image; integration tests compare
fresh renders against these goldens with SSIM. matplotlib/skimage are not
required — rendering and SSIM are first-party (tests/utils_images.py).

    python tools/generate_reference_images.py OUT_DIR stem1.flac [stem2.wav ...]
    python tools/generate_reference_images.py OUT_DIR --from-dir separated_outputs/

Regenerate the hermetic test goldens (tests/goldens/) with:

    AUDSEP_REGEN_GOLDENS=1 python -m pytest tests/test_golden_images.py -q
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# Image rendering is host-side DSP — never claim (or block on) the TPU for it.
# The axon plugin ignores JAX_PLATFORMS, so force via jax.config pre-init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

AUDIO_EXTS = {".wav", ".flac", ".mp3", ".m4a", ".ogg", ".opus", ".aiff"}


def render_file(path: str, out_dir: str) -> list:
    from utils_images import (render_spectrogram, render_waveform, write_png)

    base = os.path.splitext(os.path.basename(path))[0]
    outs = []
    for kind, render in (("spectrogram", render_spectrogram),
                         ("waveform", render_waveform)):
        img = render(path)
        out = os.path.join(out_dir, f"{base}_{kind}.png")
        write_png(out, img)
        outs.append(out)
    return outs


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("out_dir")
    parser.add_argument("inputs", nargs="*", help="audio files to render")
    parser.add_argument("--from-dir", help="render every audio file in this directory")
    args = parser.parse_args(argv)

    files = list(args.inputs)
    if args.from_dir:
        files += sorted(
            os.path.join(args.from_dir, f) for f in os.listdir(args.from_dir)
            if os.path.splitext(f)[1].lower() in AUDIO_EXTS)
    if not files:
        parser.error("no input audio files given")

    os.makedirs(args.out_dir, exist_ok=True)
    for f in files:
        for out in render_file(f, args.out_dir):
            print(out, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
