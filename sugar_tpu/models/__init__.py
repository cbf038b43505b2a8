from sugar_tpu.models.gaussians import GaussianParams, GaussianModel  # noqa: F401
