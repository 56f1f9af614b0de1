#!/bin/sh
# Build the native I/O runtime: libqgncwriter.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -pthread -std=c++17 -o libqgncwriter.so ncwriter.cc
echo "built $(pwd)/libqgncwriter.so"
