#!/bin/sh
# Build the native host-pipeline library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 loader.cpp -ljpeg -lpthread \
    -o libicafusion_host.so
echo "built $(pwd)/libicafusion_host.so"
