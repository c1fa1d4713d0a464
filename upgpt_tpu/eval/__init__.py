from upgpt_tpu.eval.metrics import ssim, ms_ssim, frechet_distance, fid_from_features  # noqa: F401
