#!/bin/bash
# Build the FULL reference stack (incl. vendored Ceres 1.14) from
# /root/reference into a scratch dir, for the measured end-to-end baseline
# (BASELINE.md) and the Ceres solve oracle.
#
# The reference tree is read-only; it is copied to $WORK/ref and patched
# minimally for THIS environment (no behavioral changes to the pipeline):
#   - FindEigen.cmake: TF-bundled Eigen 3.5 keeps its version macros in
#     Eigen/Version, not Eigen/src/Core/util/Macros.h
#   - Eigen::MappedSparseMatrix (removed in Eigen 3.5) -> Map<SparseMatrix>
#   - #include <opencv/cv.h> (OpenCV 1.x header, gone in OpenCV 4) ->
#     <opencv2/opencv.hpp>
#   - SIOCGSTAMP needs <linux/sockios.h> on modern kernels (cluon header)
#   - viewerThread.join() outside the USE_VIEWER guard (the known
#     viewer-less compile bug, euroc-state-estimation.cpp:100 / kitti:108)
#   - CV_BGR2GRAY -> cv::COLOR_BGR2GRAY (OpenCV 4 C-constant removal)
#   - the unconditional cv::imshow debug overlay in motionOnlyBA
#     (optimizer.cpp:179) disabled: aborts headless, and removing it only
#     HELPS the reference's timing
#   - -O0 -g -> -O2 (fair performance baseline; the shipped flags are a
#     debug build) and Eigen include path -> the TF-bundled Eigen
#   - Ceres: vendored 1.14 built Release, MINIGLOG, no SuiteSparse, schur
#     specializations off (tiny problems; generic eliminator suffices)
set -ex
WORK=${1:-/tmp/refwork}
EIG=/opt/venv/lib/python3.12/site-packages/tensorflow/include
mkdir -p "$WORK"

if [ ! -d "$WORK/ref" ]; then
  cp -r /root/reference "$WORK/ref"
  chmod -R u+w "$WORK/ref"
  cd "$WORK/ref"
  # FindEigen: read Eigen/Version when present
  python3 - <<'EOF'
s = open("thirdparty/ceres-solver-1.14.0/cmake/FindEigen.cmake").read()
s = s.replace(
    "set(EIGEN_VERSION_FILE ${EIGEN_INCLUDE_DIR}/Eigen/src/Core/util/Macros.h)",
    "set(EIGEN_VERSION_FILE ${EIGEN_INCLUDE_DIR}/Eigen/Version)\n"
    "  if(NOT EXISTS ${EIGEN_VERSION_FILE})\n"
    "    set(EIGEN_VERSION_FILE ${EIGEN_INCLUDE_DIR}/Eigen/src/Core/util/Macros.h)\n"
    "  endif()")
open("thirdparty/ceres-solver-1.14.0/cmake/FindEigen.cmake", "w").write(s)
EOF
  cd "$WORK/ref/thirdparty/ceres-solver-1.14.0/internal/ceres"
  sed -i 's/Eigen::MappedSparseMatrix<double, Eigen::RowMajor>/Eigen::Map<Eigen::SparseMatrix<double, Eigen::RowMajor>>/g; s/Eigen::MappedSparseMatrix<double, Eigen::ColMajor>/Eigen::Map<Eigen::SparseMatrix<double, Eigen::ColMajor>>/g' \
    covariance_impl.cc dynamic_sparse_normal_cholesky_solver.cc eigensparse.cc
  cd "$WORK/ref"
  sed -i 's|#include <opencv/cv.h>|#include <opencv2/opencv.hpp>|' include/ORBextractor.h
  sed -i '1i #include <linux/sockios.h>' include/cluon-complete-v0.0.121.hpp
  sed -i 's/CV_BGR2GRAY/cv::COLOR_BGR2GRAY/g; s/CV_BGRA2GRAY/cv::COLOR_BGRA2GRAY/g' \
    src/kitti-state-estimation.cpp src/cfsd-state-estimation.cpp src/euroc-state-estimation.cpp
  python3 - <<'EOF'
for f in ("src/euroc-state-estimation.cpp", "src/kitti-state-estimation.cpp"):
    s = open(f).read()
    s = s.replace("    viewerThread.join();",
                  "    #ifdef USE_VIEWER\n    viewerThread.join();\n    #endif")
    open(f, "w").write(s)
s = open("src/optimizer.cpp").read()
s = s.replace('    cv::imshow("before vs. after optimization", img);\n    cv::waitKey(1);\n',
              '    // headless: debug overlay disabled\n')
open("src/optimizer.cpp", "w").write(s)
s = open("CMakeLists.txt").read()
s = s.replace('set(CMAKE_CXX_FLAGS "-O0 -g")', 'set(CMAKE_CXX_FLAGS "-O2")')
s = s.replace('include_directories("/usr/include/eigen3")',
              'include_directories("/opt/venv/lib/python3.12/site-packages/tensorflow/include")')
s = s.replace('''# Sophus
find_package(Sophus REQUIRED)
include_directories(${Sophus_INCLUDE_DIRS})
set(LIBRARIES ${LIBRARIES} ${Sophus_LIBS})''',
'''# Sophus (vendored, header-only)
include_directories(${CMAKE_SOURCE_DIR}/thirdparty/Sophus-1.0.0)''')
open("CMakeLists.txt", "w").write(s)
EOF
fi

if [ ! -f "$WORK/ceres-install/lib/libceres.a" ]; then
  mkdir -p "$WORK/ceres-build"
  cd "$WORK/ceres-build"
  cmake "$WORK/ref/thirdparty/ceres-solver-1.14.0" \
    -DCMAKE_BUILD_TYPE=Release \
    -DMINIGLOG=ON -DGFLAGS=OFF -DSUITESPARSE=OFF -DCXSPARSE=OFF \
    -DLAPACK=OFF -DEIGENSPARSE=ON -DSCHUR_SPECIALIZATIONS=OFF \
    -DBUILD_EXAMPLES=OFF -DBUILD_TESTING=OFF -DBUILD_DOCUMENTATION=OFF \
    -DBUILD_SHARED_LIBS=OFF -DCXX11=ON -DOPENMP=OFF -DTBB=OFF \
    -DCMAKE_INSTALL_PREFIX="$WORK/ceres-install" \
    -DEIGEN_INCLUDE_DIR="$EIG" -DCMAKE_POLICY_VERSION_MINIMUM=3.5 -GNinja
  ninja -j1 && ninja install
fi

mkdir -p "$WORK/ref-build"
cd "$WORK/ref-build"
cmake "$WORK/ref" -DFOR_EUROC=ON -DWITH_VIEWER=OFF \
  -DCMAKE_PREFIX_PATH="$WORK/ceres-install" \
  -DCMAKE_POLICY_VERSION_MINIMUM=3.5 -GNinja
ninja -j1
ls -la "$WORK/ref/bin/euroc-state-estimation"
echo REFERENCE_BUILD_OK
