"""sugar_tpu — TPU-native Surface-Aligned Gaussian Splatting (SuGaR) framework.

A from-scratch JAX/XLA/Pallas implementation of the SuGaR pipeline
(coarse surface-aligned 3DGS -> level-set mesh extraction -> mesh-bound
refinement -> textured mesh export), designed TPU-first:

- ``sugar_tpu.raster``   — tile-based differentiable Gaussian rasterizer
  (pure-JAX reference + Pallas production kernels, custom VJP).
- ``sugar_tpu.core``     — SH evaluation, quaternions, cameras, projections.
- ``sugar_tpu.models``   — padded static-shape Gaussian model + densifier.
- ``sugar_tpu.fields``   — KNN, density/SDF field queries, point sampling.
- ``sugar_tpu.trainers`` — vanilla 3DGS, coarse density/SDF, refinement loops.
- ``sugar_tpu.meshing``  — level-set sampling, Poisson/surface-nets meshing.
- ``sugar_tpu.refine``   — mesh-bound Gaussians, texture baking.
- ``sugar_tpu.parallel`` — device-mesh sharding (data / gaussian / tile axes).
- ``sugar_tpu.io``       — COLMAP / Blender / 3DGS-PLY readers & writers.

Reference behavior derives from Anttwo/SuGaR (see SURVEY.md); the
implementation is new and TPU-native.
"""

__version__ = "0.1.0"
