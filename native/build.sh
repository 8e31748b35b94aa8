#!/bin/sh
# Builds libmmt_data.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -o libmmt_data.so \
    mmt_data.cc mmt_text.cc mmt_image.cc -ljpeg
echo "built $(pwd)/libmmt_data.so"
