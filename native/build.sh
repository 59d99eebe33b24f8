#!/bin/sh
# Build the native codec: shared library (in-process ctypes path) and the
# subprocess CLI (heap-isolated path, AUDSEP_CODEC_SUBPROCESS=1).
# Single source of truth: audio_separator_tpu/io/codec.cpp (ships inside the
# package so pip/Modal deployments can self-build — io/audio._build_native).
set -e
cd "$(dirname "$0")"
SRC=../audio_separator_tpu/io/codec.cpp
OUT=../audio_separator_tpu/io/libaudsep_codec.so
g++ -O2 -fPIC -shared -std=c++17 "$SRC" \
    -lavformat -lavcodec -lavutil -lswresample \
    -o "$OUT"
echo "built $OUT"
CLI=../audio_separator_tpu/io/audsep_codec
g++ -O2 -std=c++17 -DAUDSEP_CLI "$SRC" \
    -lavformat -lavcodec -lavutil -lswresample \
    -o "$CLI"
echo "built $CLI"
