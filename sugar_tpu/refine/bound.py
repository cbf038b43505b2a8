"""Mesh-bound Gaussians: the refined SuGaR representation.

Reference semantics (sugar_scene/sugar_model.py:149-479): Gaussians live at
fixed barycentric coordinates of mesh triangles (1/3/4/6 per triangle with
the bary tables of :172-212); learnable parameters are the mesh vertex
positions, per-Gaussian 2D scales, an in-plane rotation encoded as a complex
number, opacities and SH. Derived 3D quantities (differentiable through the
vertices):

- centers = barycentric combination of the triangle's vertices (:391-398);
- 3D scale = [thickness, exp(s1), exp(s2)] with thickness = extent / 1e6
  (:165-169, 438-441);
- rotation: first axis = face normal, second/third = learned 2D rotation of
  an in-triangle base (:444-479), converted to a quaternion.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sugar_tpu.core import sh as sh_lib
from sugar_tpu.core.quaternions import matrix_to_quaternion

BARY_TABLES = {
    1: (1.0 / 2.0 / np.sqrt(3.0), np.array([[1 / 3, 1 / 3, 1 / 3]])),
    3: (
        1.0 / 2.0 / (np.sqrt(3.0) + 1.0),
        np.array([[1 / 2, 1 / 4, 1 / 4], [1 / 4, 1 / 2, 1 / 4], [1 / 4, 1 / 4, 1 / 2]]),
    ),
    4: (
        1.0 / (4.0 * np.sqrt(3.0)),
        np.array(
            [
                [1 / 3, 1 / 3, 1 / 3],
                [2 / 3, 1 / 6, 1 / 6],
                [1 / 6, 2 / 3, 1 / 6],
                [1 / 6, 1 / 6, 2 / 3],
            ]
        ),
    ),
    6: (
        1.0 / (4.0 + 2.0 * np.sqrt(3.0)),
        np.array(
            [
                [2 / 3, 1 / 6, 1 / 6],
                [1 / 6, 2 / 3, 1 / 6],
                [1 / 6, 1 / 6, 2 / 3],
                [1 / 6, 5 / 12, 5 / 12],
                [5 / 12, 1 / 6, 5 / 12],
                [5 / 12, 5 / 12, 1 / 6],
            ]
        ),
    ),
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BoundParams:
    """Learnable parameters of the refined model."""

    vertices: jnp.ndarray  # (V, 3)
    log_scales: jnp.ndarray  # (G, 2) in-plane
    complex_rot: jnp.ndarray  # (G, 2)
    opacity_logit: jnp.ndarray  # (G,)
    sh_dc: jnp.ndarray  # (G, 3)
    sh_rest: jnp.ndarray  # (G, 3, K-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BoundMesh:
    """Fixed binding structure."""

    faces: jnp.ndarray  # (F, 3) int32
    bary: jnp.ndarray  # (gpt, 3)
    thickness: jnp.ndarray  # ()
    n_per_triangle: int = dataclasses.field(metadata=dict(static=True))


def face_geometry(vertices: jnp.ndarray, faces: jnp.ndarray):
    """(face verts (F,3,3), unit normals (F,3))."""
    fv = vertices[faces]
    n = jnp.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return fv, n


def gaussian_centers(params: BoundParams, bm: BoundMesh) -> jnp.ndarray:
    fv = params.vertices[bm.faces]  # (F, 3, 3)
    pts = jnp.einsum("fvc,gv->fgc", fv, bm.bary)  # (F, gpt, 3)
    return pts.reshape(-1, 3)


def gaussian_scales(params: BoundParams, bm: BoundMesh) -> jnp.ndarray:
    """(G, 3): [thickness, s1, s2] (sugar_model.py:438-441)."""
    s = jnp.exp(params.log_scales)
    th = jnp.broadcast_to(bm.thickness, (s.shape[0], 1))
    return jnp.concatenate([th, s], axis=-1)


def gaussian_quaternions(params: BoundParams, bm: BoundMesh) -> jnp.ndarray:
    """(G, 4): rotation whose first column is the face normal and whose
    in-plane axes are rotated by the learned complex number
    (sugar_model.py:444-479)."""
    fv, n0 = face_geometry(params.vertices, bm.faces)
    base1 = fv[:, 0] - fv[:, 1]
    base1 = base1 / jnp.maximum(jnp.linalg.norm(base1, axis=-1, keepdims=True), 1e-12)
    base2 = jnp.cross(n0, base1)
    base2 = base2 / jnp.maximum(jnp.linalg.norm(base2, axis=-1, keepdims=True), 1e-12)

    gpt = bm.n_per_triangle
    c = params.complex_rot / jnp.maximum(
        jnp.linalg.norm(params.complex_rot, axis=-1, keepdims=True), 1e-12
    )
    c = c.reshape(-1, gpt, 2)
    r1 = c[..., 0:1] * base1[:, None] + c[..., 1:2] * base2[:, None]
    r2 = -c[..., 1:2] * base1[:, None] + c[..., 0:1] * base2[:, None]
    r0 = jnp.broadcast_to(n0[:, None], r1.shape)
    # Columns of R are (r0, r1, r2).
    R = jnp.stack([r0, r1, r2], axis=-1).reshape(-1, 3, 3)
    return matrix_to_quaternion(R)


def bound_sh(params: BoundParams) -> jnp.ndarray:
    return jnp.concatenate([params.sh_dc[:, :, None], params.sh_rest], axis=-1)


def init_bound_params(
    vertices: np.ndarray,
    faces: np.ndarray,
    vertex_colors: np.ndarray | None,
    n_gaussians_per_triangle: int = 1,
    extent: float = 1.0,
    sh_degree: int = 3,
    initial_opacity: float = 0.1,
    learn_opacity: bool = True,
) -> tuple[BoundParams, BoundMesh]:
    """Bind a mesh (sugar_model.py:149-224, 320-345): per-triangle initial
    scale = min side length * circle radius; identity in-plane rotation;
    colors = barycentric vertex colors."""
    circle_radius, bary = BARY_TABLES[n_gaussians_per_triangle]
    f = faces.astype(np.int32)
    fv = vertices[f]  # (F, 3, 3)
    sides = np.linalg.norm(fv - fv[:, [1, 2, 0]], axis=-1)  # (F, 3)
    scale0 = np.maximum(sides.min(axis=-1) * circle_radius, 1e-7)  # (F,)
    g = len(f) * n_gaussians_per_triangle
    log_scales = np.log(scale0)[:, None, None].repeat(n_gaussians_per_triangle, 1).repeat(2, 2)

    cplx = np.zeros((g, 2), np.float32)
    cplx[:, 0] = 1.0

    if vertex_colors is None:
        vertex_colors = np.full((len(vertices), 3), 0.5, np.float32)
    fc = vertex_colors[f]  # (F, 3, 3)
    colors = np.einsum("fvc,gv->fgc", fc, bary).reshape(-1, 3)

    k = sh_lib.num_sh_coeffs(sh_degree)
    opacity = initial_opacity if learn_opacity else 0.9999
    params = BoundParams(
        vertices=jnp.asarray(vertices.astype(np.float32)),
        log_scales=jnp.asarray(log_scales.reshape(g, 2).astype(np.float32)),
        complex_rot=jnp.asarray(cplx),
        opacity_logit=jnp.full((g,), float(np.log(opacity / (1 - opacity))), jnp.float32),
        sh_dc=jnp.asarray(np.asarray(sh_lib.rgb_to_sh0(colors)).astype(np.float32)),
        sh_rest=jnp.zeros((g, 3, k - 1), jnp.float32),
    )
    bm = BoundMesh(
        faces=jnp.asarray(f),
        bary=jnp.asarray(bary.astype(np.float32)),
        thickness=jnp.asarray(extent / 1e6, jnp.float32),
        n_per_triangle=n_gaussians_per_triangle,
    )
    return params, bm


def to_gaussian_arrays(params: BoundParams, bm: BoundMesh):
    """Activated (centers, scales, quats, opacities, sh) for rendering or
    export (convert_refined_sugar_into_gaussians, sugar_model.py:2680)."""
    return dict(
        centers=gaussian_centers(params, bm),
        scales=gaussian_scales(params, bm),
        quaternions=gaussian_quaternions(params, bm),
        opacities=jax.nn.sigmoid(params.opacity_logit),
        sh=bound_sh(params),
    )


def edited_quaternions_and_scales(
    params: BoundParams,
    bm: BoundMesh,
    reference_vertices: jnp.ndarray,  # (V, 3) undeformed mesh
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Deformation transfer for edited/animated meshes
    (sugar_model.py:573-667 get_edited_quaternions_and_scales): when the
    bound mesh is deformed (e.g. by Blender-exported animation), the
    in-plane rotations and scales of the bound Gaussians are adjusted so
    they follow the local triangle deformation instead of staying rigid.

    Returns (quaternions (G, 4), scales (G, 3))."""
    gpt = bm.n_per_triangle
    fv = params.vertices[bm.faces]  # (F, 3, 3) deformed
    rv = reference_vertices[bm.faces]  # (F, 3, 3) reference

    def unit(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    _, n0 = face_geometry(params.vertices, bm.faces)
    base1 = unit(fv[:, 0] - fv[:, 1])
    base2 = unit(jnp.cross(n0, base1))

    # Per-corner angular deviation between reference and deformed edges.
    ref_base = unit(rv[:, 0:1] - rv[:, 1:2])
    ref_axis = unit(rv - jnp.mean(rv, axis=-2, keepdims=True))
    ref_axis = ref_axis.at[:, 2].multiply(-1.0)
    cur_base = unit(fv[:, 0:1] - fv[:, 1:2])
    cur_axis = unit(fv - jnp.mean(fv, axis=-2, keepdims=True))
    cur_axis = cur_axis.at[:, 2].multiply(-1.0)
    ref_ang = jnp.arccos(
        jnp.clip(jnp.sum(ref_axis * ref_base, axis=-1, keepdims=True), -1.0, 1.0)
    )
    cur_ang = jnp.arccos(
        jnp.clip(jnp.sum(cur_axis * cur_base, axis=-1, keepdims=True), -1.0, 1.0)
    )
    angles = cur_ang - ref_ang  # (F, 3, 1)
    pt_ang = jnp.einsum("fvc,gv->fgc", angles, bm.bary)[..., 0]  # (F, gpt)

    adj = jnp.stack([jnp.cos(pt_ang), jnp.sin(pt_ang)], axis=-1)  # (F, gpt, 2)
    c = params.complex_rot / jnp.maximum(
        jnp.linalg.norm(params.complex_rot, axis=-1, keepdims=True), 1e-12
    )
    c = c.reshape(-1, gpt, 2)
    x, y = c[..., 0], c[..., 1]
    a, b = adj[..., 0], adj[..., 1]
    c_adj = jnp.stack([x * a - y * b, x * b + y * a], axis=-1)

    r1 = c_adj[..., 0:1] * base1[:, None] + c_adj[..., 1:2] * base2[:, None]
    r2 = -c_adj[..., 1:2] * base1[:, None] + c_adj[..., 0:1] * base2[:, None]
    r0 = jnp.broadcast_to(n0[:, None], r1.shape)
    R = jnp.stack([r0, r1, r2], axis=-1).reshape(-1, 3, 3)
    quats = matrix_to_quaternion(R)

    # Scale adjustment: stretch along each corner's center-axis by the edge
    # length ratio (sugar_model.py:633-659).
    cur_ax = jnp.mean(fv, axis=-2, keepdims=True) - fv  # (F, 3, 3)
    cur_ax_n = jnp.linalg.norm(cur_ax, axis=-1, keepdims=True)
    cur_ax_u = unit(cur_ax)
    cur_orth = jnp.cross(cur_ax_u, n0[:, None])
    ref_ax = jnp.mean(rv, axis=-2, keepdims=True) - rv
    ref_ax_n = jnp.maximum(jnp.linalg.norm(ref_ax, axis=-1, keepdims=True), 1e-12)

    def corner_scale(rdir):  # rdir: (F, gpt, 3)
        ax_p = jnp.sum(rdir[:, :, None] * cur_ax_u[:, None], axis=-1, keepdims=True)
        or_p = jnp.sum(rdir[:, :, None] * cur_orth[:, None], axis=-1, keepdims=True)
        s = jnp.sqrt((ax_p * cur_ax_n[:, None] / ref_ax_n[:, None]) ** 2 + or_p**2)
        return jnp.einsum("fgvc,gv->fgc", s, bm.bary)[..., 0]  # (F, gpt)

    s1 = corner_scale(r1)
    s2 = corner_scale(r2)
    plane = jnp.exp(params.log_scales).reshape(-1, gpt, 2)
    plane = jnp.stack([plane[..., 0] * s1, plane[..., 1] * s2], axis=-1).reshape(-1, 2)
    th = jnp.broadcast_to(bm.thickness, (plane.shape[0], 1))
    return quats, jnp.concatenate([th, plane], axis=-1)


def normal_consistency_pairs(faces: np.ndarray) -> np.ndarray:
    """(P, 2) adjacent-face index pairs sharing an edge — host-side setup for
    the normal-consistency loss (replaces PyTorch3D mesh_normal_consistency,
    refine.py:775-783)."""
    edges = {}
    pairs = []
    for fi, (a, b, c) in enumerate(np.asarray(faces)):
        for e in ((a, b), (b, c), (c, a)):
            key = (min(e), max(e))
            if key in edges:
                pairs.append((edges[key], fi))
            else:
                edges[key] = fi
    return np.asarray(pairs, np.int32).reshape(-1, 2)


def normal_consistency_loss(
    vertices: jnp.ndarray, faces: jnp.ndarray, pairs: jnp.ndarray
) -> jnp.ndarray:
    """mean(1 - cos(n_i, n_j)) over adjacent face pairs."""
    _, n = face_geometry(vertices, faces)
    n1 = n[pairs[:, 0]]
    n2 = n[pairs[:, 1]]
    return jnp.mean(1.0 - jnp.sum(n1 * n2, axis=-1))


def laplacian_uniform_loss(
    vertices: jnp.ndarray, adj_idx: jnp.ndarray, adj_mask: jnp.ndarray
) -> jnp.ndarray:
    """Uniform mesh Laplacian smoothing ||v - mean(neighbors)||
    (PyTorch3D mesh_laplacian_smoothing 'uniform', coarse_sdf.py:736-739)."""
    nb = vertices[adj_idx]  # (V, K, 3)
    m = adj_mask[..., None].astype(vertices.dtype)
    mean_nb = jnp.sum(nb * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    diff = jnp.linalg.norm(vertices - mean_nb, axis=-1)
    has_nb = jnp.sum(adj_mask, axis=1) > 0
    return jnp.sum(diff * has_nb) / jnp.maximum(jnp.sum(has_nb), 1.0)


def vertex_adjacency(faces: np.ndarray, n_vertices: int, max_degree: int = 16):
    """Host-side padded vertex adjacency (idx (V, K), mask (V, K))."""
    adj = [[] for _ in range(n_vertices)]
    for a, b, c in np.asarray(faces):
        for u, v in ((a, b), (b, c), (c, a)):
            if v not in adj[u]:
                adj[u].append(v)
            if u not in adj[v]:
                adj[v].append(u)
    idx = np.zeros((n_vertices, max_degree), np.int32)
    mask = np.zeros((n_vertices, max_degree), bool)
    for i, lst in enumerate(adj):
        k = min(len(lst), max_degree)
        idx[i, :k] = lst[:k]
        mask[i, :k] = True
    return idx, mask
