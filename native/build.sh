#!/bin/sh
# Build the native clip decoder shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -o libclipdec.so clipdec.cpp -ljpeg
echo "built $(pwd)/libclipdec.so"
