#!/bin/bash
# Build and run the C++ reference (cule/multimot_track) headless on this
# machine, to measure the accuracy/speed baselines recorded in PARITY.md.
#
# The reference needs Pangolin (absent) and OpenCV 2/3 APIs; this script
# makes an out-of-tree copy and applies *build-only* shims: a stub viewer,
# OpenCV-4 constant aliases, a self-trained vocabulary, and a fix for a
# genuine out-of-bounds bug its driver hits on the truncated sample.
# No algorithmic changes.
set -euo pipefail

SRC=/root/reference
DST=/tmp/refbuild
EIGEN=/opt/venv/lib/python3.12/site-packages/tensorflow/include

rm -rf "$DST"
cp -r "$SRC" "$DST"
chmod -R u+w "$DST"
cd "$DST"

# ---- stub headers --------------------------------------------------------
mkdir -p fakeinc/pangolin fakeinc/opencv fakeinc/opencv2 \
         fakeinc/opengv/absolute_pose fakeinc/opengv/sac \
         fakeinc/opengv/sac_problems/absolute_pose
cat > fakeinc/pangolin/pangolin.h <<'EOF'
#pragma once
namespace pangolin { struct OpenGlMatrix { double m[16]; void SetIdentity(){for(int i=0;i<16;++i)m[i]=(i%5==0);} }; }
EOF
touch fakeinc/opengv/absolute_pose/methods.hpp \
      fakeinc/opengv/absolute_pose/NoncentralAbsoluteAdapter.hpp \
      fakeinc/opengv/sac/Ransac.hpp \
      fakeinc/opengv/sac_problems/absolute_pose/AbsolutePoseSacProblem.hpp
printf '#pragma once\n#include <opencv2/opencv.hpp>\n' > fakeinc/opencv/cv.h
printf '#pragma once\n#include <opencv2/opencv.hpp>\n' > fakeinc/opencv/highgui.h
printf '#pragma once\nnamespace cv { namespace xfeatures2d {} }\n' > fakeinc/opencv2/xfeatures2d.hpp
cat > fakeinc/cv_compat.h <<'EOF'
#pragma once
#include <opencv2/opencv.hpp>
#include <opencv2/core/types_c.h>
#include <opencv2/core/core_c.h>
#define CV_LOAD_IMAGE_UNCHANGED cv::IMREAD_UNCHANGED
#define CV_LOAD_IMAGE_GRAYSCALE cv::IMREAD_GRAYSCALE
#define CV_RGB2GRAY cv::COLOR_RGB2GRAY
#define CV_BGR2GRAY cv::COLOR_BGR2GRAY
#define CV_RGBA2GRAY cv::COLOR_RGBA2GRAY
#define CV_BGRA2GRAY cv::COLOR_BGRA2GRAY
#define CV_GRAY2BGR cv::COLOR_GRAY2BGR
#define CV_GRAY2RGB cv::COLOR_GRAY2RGB
#define CV_BGR2HSV cv::COLOR_BGR2HSV
#define CV_AA cv::LINE_AA
#define CV_FILLED cv::FILLED
#define CV_WINDOW_AUTOSIZE cv::WINDOW_AUTOSIZE
#define CV_REDUCE_SUM cv::REDUCE_SUM
#define CV_FONT_HERSHEY_COMPLEX cv::FONT_HERSHEY_COMPLEX
#define CV_FONT_HERSHEY_PLAIN cv::FONT_HERSHEY_PLAIN
#define CV_FONT_HERSHEY_SIMPLEX cv::FONT_HERSHEY_SIMPLEX
EOF

# ---- source patches ------------------------------------------------------
python3 - <<'PYEOF'
import re

# viewer/mapdrawer stubs (no Pangolin)
open('src/MapDrawer.cc','w').write('''#include "MapDrawer.h"
namespace ORB_SLAM2 {
MapDrawer::MapDrawer(Map* pMap, const string&) : mpMap(pMap) {}
void MapDrawer::DrawMapPoints() {}
void MapDrawer::DrawKeyFrames(const bool, const bool) {}
void MapDrawer::DrawCurrentCamera(pangolin::OpenGlMatrix&) {}
void MapDrawer::SetCurrentCameraPose(const cv::Mat& Tcw) {
  std::unique_lock<std::mutex> lock(mMutexCamera); mCameraPose = Tcw.clone(); }
void MapDrawer::SetReferenceKeyFrame(KeyFrame*) {}
void MapDrawer::GetCurrentOpenGLCameraMatrix(pangolin::OpenGlMatrix& M) { M.SetIdentity(); }
}
''')
open('src/Viewer.cc','w').write('''#include "Viewer.h"
namespace ORB_SLAM2 {
Viewer::Viewer(System*, FrameDrawer*, MapDrawer*, Tracking*, const string&) {}
void Viewer::Run() {}
void Viewer::RequestFinish() {}
void Viewer::RequestStop() {}
bool Viewer::isFinished() { return true; }
bool Viewer::isStopped() { return true; }
void Viewer::Release() {}
bool Viewer::Stop() { return true; }
bool Viewer::CheckFinish() { return true; }
void Viewer::SetFinish() {}
}
''')

s = open('src/System.cc').read()
s = s.replace('''    mpVocabulary = new ORBVocabulary();
    bool bVocLoad = mpVocabulary->loadFromTextFile(strVocFile);
    if(!bVocLoad)
    {
        cerr << "Wrong path to vocabulary. " << endl;
        cerr << "Falied to open at: " << strVocFile << endl;
        exit(-1);
    }
    cout << "Vocabulary loaded!" << endl << endl;''',
'''    mpVocabulary = new ORBVocabulary();
    if(strVocFile != "skip")
    {
        bool bVocLoad = mpVocabulary->loadFromTextFile(strVocFile);
        if(!bVocLoad) { cerr << "Wrong path to vocabulary." << endl; exit(-1); }
    }''')
s = re.sub(r'^.*pangolin::BindToContext.*$', '    // headless', s, flags=re.M)
s = s.replace('    if(mpViewer)\n    // headless\n}', '    // headless\n}')
open('src/System.cc','w').write(s)

for fn in ('src/Frame.cc','src/KeyFrame.cc'):
    t = open(fn).read()
    cls = 'Frame' if 'Frame.cc' in fn and 'Key' not in fn else 'KeyFrame'
    t = t.replace(f'void {cls}::ComputeBoW()\n{{',
                  f'void {cls}::ComputeBoW()\n{{\n    if(mpORBvocabulary->empty()) return;')
    open(fn,'w').write(t)

t = open('src/Tracking.cc').read()
t = re.sub(r'(cv::drawKeypoints\([^;]*?), 1\);', r'\1, cv::DrawMatchesFlags::DRAW_OVER_OUTIMG);', t)
t = re.sub(r'^(\s*)(cv::)?imshow\s*\(', r'\1// headless imshow(', t, flags=re.M)
t = re.sub(r'^(\s*)(cv::)?waitKey\s*\(', r'\1// headless waitKey(', t, flags=re.M)
t = re.sub(r'^(\s*)cv::imwrite\s*\(', r'\1// headless imwrite(', t, flags=re.M)
open('src/Tracking.cc','w').write(t)

d = open('Examples/RGB-D/rgbd_tum.cc').read()
d = d.replace('cv::optflow::readOpticalFlow','cv::readOpticalFlow')
d = re.sub(r'^(\s*)(cv::)?imshow\s*\(', r'\1// headless imshow(', d, flags=re.M)
d = re.sub(r'^(\s*)(cv::)?waitKey\s*\(', r'\1// headless waitKey(', d, flags=re.M)
d = d.replace('namedWindow( "Trajectory", cv::WINDOW_AUTOSIZE);', '// headless;')
d = d.replace('''        int f_id = vObjPoseGT[i][0];
        // cout << f_id << " ";
        vObjPoseID[f_id].push_back(i);''',
'''        int f_id = vObjPoseGT[i][0];
        if (f_id < (int)vObjPoseID.size())   // OOB fix for truncated sample
            vObjPoseID[f_id].push_back(i);''')
d = d.replace('        vTimesTrack[ni]=ttrack;',
              '        vTimesTrack[ni]=ttrack;\n        std::cout << "ttrack_seconds: " << ttrack << std::endl;')
open('Examples/RGB-D/rgbd_tum.cc','w').write(d)
print("patches applied")
PYEOF

# ---- build system --------------------------------------------------------
mkdir -p Thirdparty/g2o_build Thirdparty/DBoW2_build
cat > Thirdparty/DBoW2_build/CMakeLists.txt <<'EOF'
file(GLOB DBOW2_SRC ${CMAKE_CURRENT_SOURCE_DIR}/../DBoW2/DBoW2/*.cpp ${CMAKE_CURRENT_SOURCE_DIR}/../DBoW2/DUtils/*.cpp)
add_library(DBoW2_ref STATIC ${DBOW2_SRC})
target_include_directories(DBoW2_ref PUBLIC ${CMAKE_CURRENT_SOURCE_DIR}/../DBoW2)
target_compile_options(DBoW2_ref PRIVATE -w -O2)
target_link_libraries(DBoW2_ref ${OpenCV_LIBS})
EOF
cat > Thirdparty/g2o_build/CMakeLists.txt <<EOF
set(G2O_ROOT \${CMAKE_CURRENT_SOURCE_DIR}/../g2o)
set(G2O_SRC
  g2o/types/types_sba.cpp g2o/types/types_six_dof_expmap.cpp g2o/types/types_seven_dof_expmap.cpp
  g2o/core/hyper_graph_action.cpp g2o/core/hyper_graph.cpp g2o/core/marginal_covariance_cholesky.cpp
  g2o/core/matrix_structure.cpp g2o/core/batch_stats.cpp g2o/core/parameter.cpp g2o/core/cache.cpp
  g2o/core/optimizable_graph.cpp g2o/core/solver.cpp g2o/core/optimization_algorithm_factory.cpp
  g2o/core/estimate_propagator.cpp g2o/core/factory.cpp g2o/core/sparse_optimizer.cpp
  g2o/core/hyper_dijkstra.cpp g2o/core/parameter_container.cpp g2o/core/optimization_algorithm.cpp
  g2o/core/optimization_algorithm_with_hessian.cpp g2o/core/optimization_algorithm_levenberg.cpp
  g2o/core/optimization_algorithm_gauss_newton.cpp g2o/core/optimization_algorithm_dogleg.cpp
  g2o/core/jacobian_workspace.cpp g2o/core/robust_kernel.cpp g2o/core/robust_kernel_factory.cpp
  g2o/core/robust_kernel_impl.cpp g2o/stuff/timeutil.cpp g2o/stuff/os_specific.c
  g2o/stuff/string_tools.cpp g2o/stuff/property.cpp)
list(TRANSFORM G2O_SRC PREPEND \${G2O_ROOT}/)
add_library(g2o_ref STATIC \${G2O_SRC})
target_include_directories(g2o_ref PUBLIC \${G2O_ROOT} \${G2O_ROOT}/g2o/core $EIGEN)
target_compile_options(g2o_ref PRIVATE -w -O2)
EOF

cat > CMakeLists.txt <<EOF
cmake_minimum_required(VERSION 3.10)
project(MultMotTrack)
set(CMAKE_BUILD_TYPE Release)
set(CMAKE_CXX_STANDARD 14)
set(CMAKE_CXX_FLAGS "\${CMAKE_CXX_FLAGS} -O2 -w -include \${PROJECT_SOURCE_DIR}/fakeinc/cv_compat.h")
add_definitions(-DCOMPILEDWITHC11)
find_package(OpenCV 4 REQUIRED)
include_directories(\${PROJECT_SOURCE_DIR} \${PROJECT_SOURCE_DIR}/include \${PROJECT_SOURCE_DIR}/fakeinc $EIGEN \${OpenCV_INCLUDE_DIRS})
add_subdirectory(Thirdparty/g2o_build)
add_subdirectory(Thirdparty/DBoW2_build)
add_library(\${PROJECT_NAME} STATIC
  src/System.cc src/Tracking.cc src/LocalMapping.cc src/LoopClosing.cc src/ORBextractor.cc
  src/ORBmatcher.cc src/FrameDrawer.cc src/Converter.cc src/MapPoint.cc src/KeyFrame.cc
  src/Map.cc src/MapDrawer.cc src/Optimizer.cc src/PnPsolver.cc src/Frame.cc
  src/KeyFrameDatabase.cc src/Sim3Solver.cc src/Initializer.cc src/Viewer.cc
  src/flow/motiontocolor.cpp src/flow/Image.cpp src/flow/RefCntMem.cpp
  src/flow/colorcode.cpp src/flow/flowIO.cpp)
target_link_libraries(\${PROJECT_NAME} \${OpenCV_LIBS} g2o_ref DBoW2_ref pthread)
add_executable(rgbd_mmt Examples/RGB-D/rgbd_tum.cc)
target_link_libraries(rgbd_mmt \${PROJECT_NAME})
add_executable(makevoc makevoc.cc)
target_link_libraries(makevoc \${PROJECT_NAME})
EOF

cat > makevoc.cc <<'EOF'
#include "ORBVocabulary.h"
#include "ORBextractor.h"
#include <opencv2/opencv.hpp>
#include <iostream>
using namespace ORB_SLAM2;
int main(int argc, char** argv) {
  std::vector<std::vector<cv::Mat>> features;
  ORBextractor ext(2000, 1.2f, 8, 20, 7);
  for (int i = 0; i < 5; ++i) {
    char buf[256];
    snprintf(buf, sizeof buf, "%s/image/%06d.png", argv[1], i);
    cv::Mat im = cv::imread(buf, cv::IMREAD_GRAYSCALE);
    if (im.empty()) continue;
    std::vector<cv::KeyPoint> kps; cv::Mat desc;
    ext(im, cv::Mat(), kps, desc);
    std::vector<cv::Mat> fs;
    for (int r = 0; r < desc.rows; ++r) fs.push_back(desc.row(r).clone());
    features.push_back(fs);
  }
  ORBVocabulary voc(8, 4, DBoW2::TF_IDF, DBoW2::L1_NORM);
  voc.create(features);
  voc.saveToTextFile(argv[2]);
  return 0;
}
EOF

mkdir -p build && cd build
cmake .. > /dev/null
make -j2 rgbd_mmt makevoc 2>&1 | tail -1
cd "$DST"
./build/makevoc kitti_sample /tmp/sample_voc.txt
(timeout 400 stdbuf -o0 ./build/rgbd_mmt /tmp/sample_voc.txt kitti_sample/kitti03.yaml kitti_sample || true) | tee /tmp/ref_run.log | grep -E "ttrack_seconds|relative pose error|object speed"
echo "full log: /tmp/ref_run.log"
