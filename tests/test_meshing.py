"""Tests for surface reconstruction: surface nets, Poisson, mesh ops."""

import numpy as np

from sugar_tpu.meshing import meshops
from sugar_tpu.meshing.poisson import (
    poisson_reconstruct,
    remove_low_density_vertices,
    surface_nets,
)


def sphere_points(n=20000, r=1.0, seed=0):
    g = np.random.default_rng(seed)
    d = g.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return (r * d).astype(np.float32), d.astype(np.float32)


class TestSurfaceNets:
    def test_sphere_sdf(self):
        res = 48
        xs = np.linspace(-1.5, 1.5, res)
        X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
        field = np.sqrt(X**2 + Y**2 + Z**2) - 1.0
        verts, faces = surface_nets(field.astype(np.float32), 0.0)
        assert len(verts) > 500 and len(faces) > 1000
        # Vertices lie near the unit sphere (grid coords -> world).
        scale = xs[1] - xs[0]
        world = verts * scale + xs[0]
        radii = np.linalg.norm(world, axis=-1)
        assert abs(radii.mean() - 1.0) < 0.05
        assert radii.std() < 0.05
        # Every face references valid vertices; mesh is edge-manifold-ish:
        # each undirected edge appears exactly twice for a closed surface.
        edges = np.concatenate(
            [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]
        )
        ekey = np.sort(edges, axis=1)
        _, counts = np.unique(ekey, axis=0, return_counts=True)
        assert (counts == 2).mean() > 0.99

    def test_orientation_outward(self):
        res = 32
        xs = np.linspace(-1.5, 1.5, res)
        X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
        field = np.sqrt(X**2 + Y**2 + Z**2) - 1.0
        verts, faces = surface_nets(field.astype(np.float32), 0.0)
        scale = xs[1] - xs[0]
        world = verts * scale + xs[0]
        fn = meshops.face_normals(world, faces)
        centers = world[faces].mean(axis=1)
        outward = np.sum(fn * centers, axis=-1)
        # Consistent orientation: nearly all normals point the same way.
        frac_out = (outward > 0).mean()
        assert frac_out > 0.99 or frac_out < 0.01


class TestPoisson:
    def test_sphere_reconstruction(self):
        pts, nrm = sphere_points()
        res = poisson_reconstruct(pts, nrm, resolution=96)
        assert len(res.vertices) > 1000
        radii = np.linalg.norm(res.vertices, axis=-1)
        # Poisson from clean samples: surface within a few percent of r=1.
        assert abs(np.median(radii) - 1.0) < 0.08, np.median(radii)
        assert radii.std() < 0.12
        # Density support is positive near samples.
        v, f = remove_low_density_vertices(res, 0.1)
        assert len(v) <= len(res.vertices)
        assert len(f) > 0

    def test_noisy_sphere(self):
        g = np.random.default_rng(1)
        pts, nrm = sphere_points(n=30000)
        pts = pts + 0.01 * g.normal(size=pts.shape).astype(np.float32)
        res = poisson_reconstruct(pts, nrm, resolution=64)
        radii = np.linalg.norm(res.vertices, axis=-1)
        assert abs(np.median(radii) - 1.0) < 0.1


class TestMeshOps:
    def test_outlier_removal(self):
        pts, nrm = sphere_points(n=5000)
        outliers = np.array([[10, 10, 10], [-8, 5, 3]], np.float32)
        allpts = np.concatenate([pts, outliers])
        extra = np.arange(len(allpts))
        clean, (e,) = meshops.remove_statistical_outliers(
            allpts, [extra], nb_neighbors=20, std_ratio=3.0
        )
        assert len(clean) <= 5000
        assert not np.isin([5000, 5001], e).any()

    def test_clean_mesh(self):
        verts = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 0], [2, 2, 2]], np.float32
        )
        faces = np.array([[0, 1, 2], [3, 1, 2], [1, 1, 2]], np.int64)
        v, f = meshops.clean_mesh(verts, faces)
        # verts 0 and 3 merge; duplicate face collapses; degenerate dropped;
        # unreferenced vertex (2,2,2) removed.
        assert len(v) == 3
        assert len(f) == 1

    def test_qem_decimation(self):
        from sugar_tpu.native import qem_available, qem_decimate

        if not qem_available():
            import pytest

            pytest.skip("no C++ toolchain")
        pts, nrm = sphere_points(n=8000)
        res = poisson_reconstruct(pts, nrm, resolution=64)
        v, f = qem_decimate(res.vertices, res.faces, 600)
        assert len(v) <= 650
        radii = np.linalg.norm(v, axis=-1)
        # QEM preserves the sphere far better than clustering.
        assert abs(np.median(radii) - 1.0) < 0.05
        assert radii.std() < 0.05
        # Faces index valid vertices, no degenerates.
        assert f.min() >= 0 and f.max() < len(v)
        assert (
            (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])
        ).all()

    def test_decimation_reduces(self):
        pts, nrm = sphere_points(n=8000)
        res = poisson_reconstruct(pts, nrm, resolution=64)
        v, f = meshops.decimate_vertex_clustering(res.vertices, res.faces, 500)
        assert len(v) < 1000
        assert len(f) > 100
        radii = np.linalg.norm(v, axis=-1)
        assert abs(np.median(radii) - 1.0) < 0.12

    def test_vertex_normals_sphere(self):
        pts, nrm = sphere_points(n=8000)
        res = poisson_reconstruct(pts, nrm, resolution=64)
        vn = meshops.vertex_normals(res.vertices, res.faces)
        # Radial alignment (up to global sign).
        r = res.vertices / np.maximum(
            np.linalg.norm(res.vertices, axis=-1, keepdims=True), 1e-9
        )
        align = np.abs(np.sum(vn * r, axis=-1))
        assert np.median(align) > 0.95


class TestPCANormals:
    def test_sphere_normals_radial(self):
        import jax.numpy as jnp

        from sugar_tpu.fields.normals import estimate_pointcloud_normals

        pts, true_nrm = sphere_points(n=4000)
        est = np.asarray(
            estimate_pointcloud_normals(jnp.asarray(pts), neighborhood_size=32)
        )
        # PCA normals match the radial direction up to sign; the majority
        # disambiguation resolves signs only locally-consistently.
        cos = np.abs(np.sum(est * true_nrm, axis=-1))
        assert np.median(cos) > 0.99
        assert (cos > 0.9).mean() > 0.95

    def test_centers_ablation_end_to_end(self):
        from sugar_tpu.core.cameras import make_camera
        from sugar_tpu.meshing.ablations import extract_mesh_from_gaussian_centers
        from sugar_tpu.models.gaussians import create_from_pcd

        pts, _ = sphere_points(n=3000)
        g = np.random.default_rng(0)
        cols = g.uniform(0.2, 1, (len(pts), 3)).astype(np.float32)
        model = create_from_pcd(pts.astype(np.float32), cols, 4096,
                                sh_degree=0, initial_opacity=0.9)
        cams = [make_camera(R=np.eye(3), T=np.zeros(3), fov_x=1.0, fov_y=1.0,
                            height=16, width=16)]
        v, f = extract_mesh_from_gaussian_centers(
            model, cams, poisson_resolution=64, decimation_target=5000)
        assert len(v) > 100 and len(f) > 100
        r = np.linalg.norm(v, axis=1)
        assert abs(np.median(r) - 1.0) < 0.1
