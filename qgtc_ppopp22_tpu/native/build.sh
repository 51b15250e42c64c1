#!/bin/sh
# Build the native host library (see __init__.py for the lazy builder).
set -e
cd "$(dirname "$0")"
g++ -O3 -fopenmp -shared -fPIC -std=c++17 \
    qgtc_native.cpp -o libqgtc_native.so
echo "built $(pwd)/libqgtc_native.so"
