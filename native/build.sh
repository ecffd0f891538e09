#!/bin/sh
# Build libgraphcore.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC -o libgraphcore.so graphcore.cpp
echo "built $(pwd)/libgraphcore.so"
