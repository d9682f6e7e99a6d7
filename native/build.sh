#!/bin/sh
# Build the native I/O runtime (no external dependencies).
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o libopencorr_native.so opencorr_native.cpp
echo "built $(pwd)/libopencorr_native.so"
