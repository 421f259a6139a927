#!/bin/sh
# Build the native loader shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC loader.cc -o libaslloader.so -lz -lpthread
echo "built native/libaslloader.so"
