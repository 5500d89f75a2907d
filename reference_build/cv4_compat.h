// OpenCV 2.x constant names used by the reference, mapped to their
// OpenCV 4.x equivalents.  Force-included via -include so the reference
// sources build unmodified against the system OpenCV 4.6.
#pragma once
#include <opencv2/opencv.hpp>
#ifndef CV_BGR2GRAY
#define CV_BGR2GRAY cv::COLOR_BGR2GRAY
#endif
#ifndef CV_CAP_PROP_FRAME_COUNT
#define CV_CAP_PROP_FRAME_COUNT cv::CAP_PROP_FRAME_COUNT
#endif
#ifndef CV_COMP_KL_DIV
#define CV_COMP_KL_DIV cv::HISTCMP_KL_DIV
#endif
