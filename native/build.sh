#!/bin/sh
# Build the native codec: shared library (in-process ctypes path) and the
# subprocess CLI (heap-isolated path, AUDSEP_CODEC_SUBPROCESS=1).
set -e
cd "$(dirname "$0")"
# Keep the packaged copy of the source in sync (io/audio._build_native uses
# it to self-build in pip-installed / source-mounted deployments; a test
# asserts the two files match).
cp codec.cpp ../audio_separator_tpu/io/codec.cpp
OUT=../audio_separator_tpu/io/libaudsep_codec.so
g++ -O2 -fPIC -shared -std=c++17 codec.cpp \
    -lavformat -lavcodec -lavutil -lswresample \
    -o "$OUT"
echo "built $OUT"
CLI=../audio_separator_tpu/io/audsep_codec
g++ -O2 -std=c++17 -DAUDSEP_CLI codec.cpp \
    -lavformat -lavcodec -lavutil -lswresample \
    -o "$CLI"
echo "built $CLI"
