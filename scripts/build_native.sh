#!/bin/sh
# Builds the native data-layer codecs (auto-built on first import too;
# this script exists for explicit/offline builds).
set -e
cd "$(dirname "$0")/.."
${CC:-cc} -O2 -shared -fPIC \
  -o nerf_from_image_tpu/data/_native/librle.so \
  nerf_from_image_tpu/data/_native/rle.c
echo built nerf_from_image_tpu/data/_native/librle.so
