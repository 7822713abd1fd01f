#!/bin/sh
# Build libmdv2_native.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o libmdv2_native.so src/mdv2_native.cpp
echo "built $(pwd)/libmdv2_native.so"
