// Round-5 floor anchor: the C++ reference solving the HYPERSPECTRAL-PCA
// bench geometry (bench.py bench_hyperspectral_pca): the identical 64-band
// 512^2 synthetic cube (dumped from the bench's own RNG), 4 LR frames at 2x
// (blur 3/1.5), SpectralPCA trained on the LR observations at 99.9% retained
// variance, TV lambda 0.01 solve in PCA space (ONE IRLS iteration x 20 CG
// iterations, zero initial), back-projected and scored against the cube.
#include <memory>
#include <vector>

#include "driver_common.h"
#include "hyperspectral/spectral_pca.h"
#include "image_model/image_model.h"
#include "optimization/irls_map_solver.h"
#include "optimization/tv_regularizer.h"

using namespace super_resolution;

int main() {
  int c, h, w;
  std::vector<double> cube = ReadBin("data/pca_cube.bin", &c, &h, &w);
  ImageData gt(cube.data(), cv::Size(w, h), c);

  ImageModelParameters params;
  params.scale = 2;
  params.blur_radius = 3;
  params.blur_sigma = 1.5;
  params.motion_sequence_path = "data/motion4.txt";
  ImageModel model = ImageModel::CreateImageModel(params);

  std::vector<ImageData> observations;
  for (int k = 0; k < 4; ++k) observations.push_back(model.ApplyToImage(gt, k));

  SpectralPCA pca(observations, 0.999);
  std::vector<ImageData> obs_pca;
  for (const ImageData& obs : observations)
    obs_pca.push_back(pca.GetPCAImage(obs));
  const int k_pca = obs_pca[0].GetNumChannels();
  std::printf("num_pca_bands=%d\n", k_pca);

  IRLSMapSolverOptions options;
  options.max_num_irls_iterations = 1;   // weights = 1: the benched solve
  options.max_num_solver_iterations = 20;
  options.gradient_norm_threshold = 0.0;
  options.cost_decrease_threshold = 0.0;
  options.parameter_variation_threshold = 0.0;

  IRLSMapSolver solver(options, model, obs_pca, false);
  solver.AddRegularizer(
      std::shared_ptr<Regularizer>(
          new TotalVariationRegularizer(cv::Size(w, h))),
      0.01);

  std::vector<double> zeros((size_t)k_pca * h * w, 0.0);
  ImageData initial(zeros.data(), cv::Size(w, h), k_pca);
  ImageData result = solver.Solve(initial);

  ImageData recon = pca.ReconstructImage(result);
  std::printf("reference_pca_psnr_db=%.4f\n", Psnr(recon, gt, 0));
  return 0;
}
