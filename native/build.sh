#!/usr/bin/env bash
# Build the native vidmeta library (C++17, no external deps).
set -e
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -shared -fPIC vidmeta.cpp -o libvidmeta.so
echo "built $(pwd)/libvidmeta.so"
