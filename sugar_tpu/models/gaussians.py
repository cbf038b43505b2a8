"""Padded, static-shape 3D Gaussian model.

TPU-native re-design of the reference ``GaussianModel``
(gaussian_splatting/scene/gaussian_model.py:24-147): parameters live in
fixed-``capacity`` buffers with an ``alive`` mask so densify/clone/split/prune
never reallocate (XLA static shapes; SURVEY.md §2.9 "sharded densification").
Dead slots are force-culled by the rasterizer via ``alive_mask``.

Activations match the reference exactly: scales = exp(log_scales), opacity =
sigmoid(logit), rotation = L2-normalized quaternion (gaussian_model.py:26-59).

SH layout: ``sh_dc`` (N, 3) + ``sh_rest`` (N, 3, K-1), channel-major,
identical to the PLY contract (io/ply.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sugar_tpu.core import sh as sh_lib
from sugar_tpu.core.quaternions import normalize as quat_normalize
from sugar_tpu.io import ply as ply_io


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianParams:
    """Raw (pre-activation) optimizable parameters; all (capacity, ...)."""

    xyz: jnp.ndarray  # (N, 3)
    sh_dc: jnp.ndarray  # (N, 3)
    sh_rest: jnp.ndarray  # (N, 3, K-1)
    opacity_logit: jnp.ndarray  # (N,)
    log_scales: jnp.ndarray  # (N, 3)
    quaternions: jnp.ndarray  # (N, 4) raw; normalized on use


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianModel:
    """Params + aliveness. ``n_alive`` is a traced scalar; ``capacity`` and
    ``sh_degree`` are static."""

    params: GaussianParams
    alive: jnp.ndarray  # (N,) bool
    sh_degree: int = dataclasses.field(metadata=dict(static=True))

    @property
    def capacity(self) -> int:
        return self.params.xyz.shape[0]

    @property
    def n_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))

    # --- activations (reference gaussian_model.py:26-59) ---
    @property
    def scales(self) -> jnp.ndarray:
        return jnp.exp(self.params.log_scales)

    @property
    def opacities(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.params.opacity_logit)

    @property
    def quaternions(self) -> jnp.ndarray:
        return quat_normalize(self.params.quaternions)

    @property
    def sh(self) -> jnp.ndarray:
        """(N, 3, K) full SH coefficient tensor."""
        return jnp.concatenate([self.params.sh_dc[:, :, None], self.params.sh_rest], axis=-1)


def mean_sq_dist_3nn(points: np.ndarray) -> np.ndarray:
    """Mean squared distance to the 3 nearest neighbors (simple-knn
    ``distCUDA2`` semantics, spatial.cu:15-27). Host-side init helper."""
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    d, _ = tree.query(points, k=4)  # includes self at d[:,0]=0
    return np.mean(d[:, 1:4] ** 2, axis=1)


def create_from_pcd(
    points: np.ndarray,
    colors: np.ndarray,
    capacity: int,
    sh_degree: int = 3,
    initial_opacity: float = 0.1,
) -> GaussianModel:
    """Initialize from a COLMAP/random point cloud.

    Reference semantics (gaussian_model.py:124-147): SH-DC from RGB2SH,
    isotropic log-scale = log(sqrt(mean 3-NN sq dist)) clamped at 1e-7,
    identity rotations, opacity logit = inverse_sigmoid(0.1).
    """
    n = points.shape[0]
    assert capacity >= n, f"capacity {capacity} < point count {n}"
    k = sh_lib.num_sh_coeffs(sh_degree)

    dist2 = np.maximum(mean_sq_dist_3nn(points), 1e-7)
    log_s = np.log(np.sqrt(dist2))[:, None].repeat(3, axis=1)

    def pad(x, fill=0.0):
        shape = (capacity - n,) + x.shape[1:]
        return np.concatenate([x, np.full(shape, fill, x.dtype)], axis=0)

    xyz = pad(points.astype(np.float32))
    sh_dc = pad(np.asarray(sh_lib.rgb_to_sh0(colors)).astype(np.float32))
    sh_rest = pad(np.zeros((n, 3, k - 1), np.float32))
    opacity = pad(
        np.full(n, float(inverse_sigmoid(initial_opacity)), np.float32),
        fill=-10.0,
    )
    log_scales = pad(log_s.astype(np.float32), fill=-10.0)
    quats = pad(
        np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)), fill=0.0
    )
    quats[n:, 0] = 1.0
    alive = np.zeros(capacity, bool)
    alive[:n] = True

    return GaussianModel(
        params=GaussianParams(
            xyz=jnp.asarray(xyz),
            sh_dc=jnp.asarray(sh_dc),
            sh_rest=jnp.asarray(sh_rest),
            opacity_logit=jnp.asarray(opacity),
            log_scales=jnp.asarray(log_scales),
            quaternions=jnp.asarray(quats),
        ),
        alive=jnp.asarray(alive),
        sh_degree=sh_degree,
    )


def save_ply(model: GaussianModel, path: str) -> None:
    """Write alive Gaussians in the canonical 3DGS PLY format."""
    alive = np.asarray(model.alive)
    p = model.params
    ply_io.save_gaussian_ply(
        path,
        xyz=np.asarray(p.xyz)[alive],
        sh_dc=np.asarray(p.sh_dc)[alive],
        sh_rest=np.asarray(p.sh_rest)[alive],
        opacity_logit=np.asarray(p.opacity_logit)[alive],
        log_scales=np.asarray(p.log_scales)[alive],
        quaternions=np.asarray(p.quaternions)[alive],
    )


def load_ply(path: str, capacity: int | None = None, sh_degree: int | None = None) -> GaussianModel:
    """Load a 3DGS PLY into a padded model (capacity defaults to the count
    rounded up to a multiple of 256). ``sh_degree`` is inferred from the
    f_rest attribute count when not given (load_ply semantics,
    gaussian_model.py:216-231)."""
    d = ply_io.load_gaussian_ply(path)
    n = d["xyz"].shape[0]
    if sh_degree is None:
        k_total = d["sh_rest"].shape[-1] + 1
        sh_degree = int(round(np.sqrt(k_total))) - 1
    k = sh_lib.num_sh_coeffs(sh_degree)
    assert d["sh_rest"].shape[-1] == k - 1, (
        f"PLY has {d['sh_rest'].shape[-1]} rest coeffs, expected {k - 1}"
    )
    if capacity is None:
        capacity = ((n + 255) // 256) * 256

    def pad(x, fill=0.0):
        shape = (capacity - n,) + x.shape[1:]
        return np.concatenate([x, np.full(shape, fill, x.dtype)], axis=0)

    quats = pad(d["quaternions"])
    quats[n:, 0] = 1.0
    alive = np.zeros(capacity, bool)
    alive[:n] = True
    return GaussianModel(
        params=GaussianParams(
            xyz=jnp.asarray(pad(d["xyz"])),
            sh_dc=jnp.asarray(pad(d["sh_dc"])),
            sh_rest=jnp.asarray(pad(d["sh_rest"])),
            opacity_logit=jnp.asarray(pad(d["opacity_logit"], fill=-10.0)),
            log_scales=jnp.asarray(pad(d["log_scales"], fill=-10.0)),
            quaternions=jnp.asarray(quats),
        ),
        alive=jnp.asarray(alive),
        sh_degree=sh_degree,
    )
