#!/bin/sh
# Build the native codec shared library into the Python package.
set -e
cd "$(dirname "$0")"
OUT=../audio_separator_tpu/io/libaudsep_codec.so
g++ -O2 -fPIC -shared -std=c++17 codec.cpp \
    -lavformat -lavcodec -lavutil -lswresample \
    -o "$OUT"
echo "built $OUT"
