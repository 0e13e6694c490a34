#!/bin/sh
# Build the native fastloader shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    fastloader.cpp -o libfastloader.so -ljpeg -lpng -lpthread
echo "built $(pwd)/libfastloader.so"
