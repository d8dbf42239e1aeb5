#!/bin/sh
# Build the native IO tier (csrc/gsmpm_native.cpp) into gsmpm_tpu/io/.
set -e
cd "$(dirname "$0")/.."
exec g++ -O3 -std=c++17 -shared -fPIC -pthread \
  -o gsmpm_tpu/io/libgsmpm_native.so csrc/gsmpm_native.cpp csrc/gsmpm_video.cpp
