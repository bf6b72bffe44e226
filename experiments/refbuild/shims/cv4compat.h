// OpenCV 4 compatibility for the reference's OpenCV 2/3-era constants.
#pragma once
#include <opencv2/imgproc.hpp>
#include <opencv2/imgcodecs.hpp>
#ifndef CV_BGR2YCrCb
#define CV_BGR2YCrCb cv::COLOR_BGR2YCrCb
#endif
#ifndef CV_YCrCb2BGR
#define CV_YCrCb2BGR cv::COLOR_YCrCb2BGR
#endif
#ifndef CV_LOAD_IMAGE_COLOR
#define CV_LOAD_IMAGE_COLOR cv::IMREAD_COLOR
#endif
#ifndef CV_LOAD_IMAGE_GRAYSCALE
#define CV_LOAD_IMAGE_GRAYSCALE cv::IMREAD_GRAYSCALE
#endif
#ifndef CV_INTER_LINEAR
#define CV_INTER_LINEAR cv::INTER_LINEAR
#endif
#ifndef CV_INTER_NN
#define CV_INTER_NN cv::INTER_NEAREST
#endif
#ifndef CV_INTER_CUBIC
#define CV_INTER_CUBIC cv::INTER_CUBIC
#endif
#ifndef CV_INTER_AREA
#define CV_INTER_AREA cv::INTER_AREA
#endif
#ifndef CV_PCA_DATA_AS_ROW
#define CV_PCA_DATA_AS_ROW cv::PCA::DATA_AS_ROW
#endif
