#!/bin/sh
# Build the native helper library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    bvh_builder.cpp ply_loader.cpp \
    -o libvspg_native.so
echo "built $(pwd)/libvspg_native.so"
