#!/bin/sh
# Build the native loader shared library next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 loader.cpp prefetch.cpp -o libsaccot_native.so -lpthread
echo "built $(pwd)/libsaccot_native.so"
