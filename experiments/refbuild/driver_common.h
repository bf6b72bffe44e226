// Shared helpers for the round-5 floor-anchor drivers.
#pragma once
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include "image/image_data.h"

// Reads the repo's .bin dump format: int32 c, h, w header + float64 data
// (channel-major).
inline std::vector<double> ReadBin(const std::string& path,
                                   int* c, int* h, int* w) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) { std::fprintf(stderr, "cannot open %s\n", path.c_str()); std::exit(1); }
  int dims[3];
  if (std::fread(dims, sizeof(int), 3, f) != 3) std::exit(1);
  *c = dims[0]; *h = dims[1]; *w = dims[2];
  std::vector<double> data((size_t)dims[0] * dims[1] * dims[2]);
  if (std::fread(data.data(), sizeof(double), data.size(), f) != data.size())
    std::exit(1);
  std::fclose(f);
  return data;
}

inline double Psnr(const super_resolution::ImageData& a,
                   const super_resolution::ImageData& b,
                   int crop = 0) {
  double se = 0.0;
  long n = 0;
  for (int c = 0; c < a.GetNumChannels(); ++c) {
    cv::Mat ma = a.GetChannelImage(c);
    cv::Mat mb = b.GetChannelImage(c);
    for (int r = crop; r < ma.rows - crop; ++r) {
      for (int col = crop; col < ma.cols - crop; ++col) {
        double d = ma.at<double>(r, col) - mb.at<double>(r, col);
        se += d * d;
        ++n;
      }
    }
  }
  return -10.0 * std::log10(se / n);
}
