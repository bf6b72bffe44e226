// Round-5 floor anchor: the C++ reference solving the WAVELET bench geometry
// (bench.py bench_wavelet): dallas 1000^2 gt, 4 LR frames at 4x (blur 3/1.5,
// shifts (0,0),(1,1),(0,1),(1,0)), each frame's four Haar subbands stacked as
// 4 channels of ONE solve (channel-separable objective), TV lambda 0.01,
// ONE IRLS iteration (weights = 1) x 25 CG iterations from a zero initial —
// the exact inner-solve budget the bench times. Prints the reference's PSNR
// of the solved subbands against the ground truth's subbands (2 px crop).
#include <memory>
#include <vector>

#include "driver_common.h"
#include "image_model/image_model.h"
#include "motion/motion_shift.h"
#include "optimization/irls_map_solver.h"
#include "optimization/tv_regularizer.h"
#include "wavelet/wavelet_transform.h"

using namespace super_resolution;

int main() {
  int c, h, w;
  std::vector<double> gt_data = ReadBin("data/dallas_gray.bin", &c, &h, &w);
  ImageData gt(gt_data.data(), cv::Size(w, h), 1);

  ImageModelParameters params;
  params.scale = 4;
  params.blur_radius = 3;
  params.blur_sigma = 1.5;
  params.motion_sequence_path = "data/motion4.txt";
  ImageModel model = ImageModel::CreateImageModel(params);

  // LR observations, then their subband stacks as 4-channel images.
  std::vector<ImageData> subband_frames;
  for (int k = 0; k < 4; ++k) {
    ImageData lr = model.ApplyToImage(gt, k);
    wavelet::WaveletCoefficients coeffs = wavelet::WaveletTransform(lr);
    ImageData stacked;
    stacked.AddChannel(coeffs.ll.GetChannelImage(0), DO_NOT_NORMALIZE_IMAGE);
    stacked.AddChannel(coeffs.lh.GetChannelImage(0), DO_NOT_NORMALIZE_IMAGE);
    stacked.AddChannel(coeffs.hl.GetChannelImage(0), DO_NOT_NORMALIZE_IMAGE);
    stacked.AddChannel(coeffs.hh.GetChannelImage(0), DO_NOT_NORMALIZE_IMAGE);
    subband_frames.push_back(stacked);
  }

  IRLSMapSolverOptions options;
  options.max_num_irls_iterations = 1;   // weights = 1: the benched solve
  options.max_num_solver_iterations = 25;
  options.gradient_norm_threshold = 0.0;
  options.cost_decrease_threshold = 0.0;
  options.parameter_variation_threshold = 0.0;

  IRLSMapSolver solver(options, model, subband_frames, false);
  const int hs = (h / 4) * 2, ws = (w / 4) * 2;  // 500^2 subband HR grid
  solver.AddRegularizer(
      std::shared_ptr<Regularizer>(
          new TotalVariationRegularizer(cv::Size(ws, hs))),
      0.01);

  std::vector<double> zeros((size_t)4 * hs * ws, 0.0);
  ImageData initial(zeros.data(), cv::Size(ws, hs), 4);
  ImageData result = solver.Solve(initial);

  wavelet::WaveletCoefficients gt_coeffs = wavelet::WaveletTransform(gt);
  ImageData gt_sub;
  gt_sub.AddChannel(gt_coeffs.ll.GetChannelImage(0), DO_NOT_NORMALIZE_IMAGE);
  gt_sub.AddChannel(gt_coeffs.lh.GetChannelImage(0), DO_NOT_NORMALIZE_IMAGE);
  gt_sub.AddChannel(gt_coeffs.hl.GetChannelImage(0), DO_NOT_NORMALIZE_IMAGE);
  gt_sub.AddChannel(gt_coeffs.hh.GetChannelImage(0), DO_NOT_NORMALIZE_IMAGE);

  std::printf("reference_wavelet_psnr_db=%.4f\n", Psnr(result, gt_sub, 2));
  return 0;
}
