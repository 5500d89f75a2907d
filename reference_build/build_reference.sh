#!/bin/bash
# Build the unmodified reference sources (/root/reference/src) out-of-tree
# so its speed can be measured as the BASELINE.md reference row.
# Substitutions for the missing toolchain pieces (documented in BASELINE.md):
#   - Eigen3:       TensorFlow's bundled Eigen headers (header-only)
#   - boost::thread: shim/boost/* mapping thread_group -> std::thread
#   - OpenCV 2 constant names: cv4_compat.h force-included (-include)
set -euo pipefail
cd "$(dirname "$0")"
REF=/root/reference/src
EIGEN=/opt/venv/lib/python3.12/site-packages/tensorflow/include
# plain -O3, matching the reference CMakeLists (CMakeLists.txt:20); no
# -march=native both for faithfulness and because TF-Eigen's AVX512-FP16
# path does not compile under this gcc
CXXFLAGS="-O3 -std=c++17 -w -include cv4_compat.h -I shim -isystem $EIGEN $(pkg-config --cflags opencv4)"
LIBS="$(pkg-config --libs opencv4) -lpthread"
mkdir -p build
for f in DepthPropagation DisplayFunc EigenInitialization Frame \
         GlobalOptimize ImageFunc PixelWisePyramid Pyramid UserDefinedFunc \
         main; do
  if [ ! -f build/$f.o ] || [ $REF/$f.cpp -nt build/$f.o ]; then
    echo "CXX $f.cpp"
    g++ $CXXFLAGS -c $REF/$f.cpp -o build/$f.o &
  fi
done
wait
g++ $CXXFLAGS -c headless_stubs.cpp -o build/zz_headless_stubs.o
g++ build/*.o -o build/ELLC $LIBS
echo "built: $(pwd)/build/ELLC"
