"""Tests: triangle rasterizer, UV atlas, texture baking, OBJ export."""

import numpy as np
import jax.numpy as jnp

from sugar_tpu.core.cameras import make_camera
from sugar_tpu.io.obj import load_obj, save_obj
from sugar_tpu.refine import bound as B
from sugar_tpu.refine.mesh_raster import rasterize_mesh
from sugar_tpu.refine.texture import bake_texture, build_uv_atlas


def facing_quad(z=2.0, half=0.8):
    verts = np.array(
        [[-half, -half, z], [half, -half, z], [half, half, z], [-half, half, z]],
        np.float32,
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    return verts, faces


class TestMeshRasterizer:
    def test_quad_coverage_and_depth(self):
        verts, faces = facing_quad()
        cam = make_camera(
            R=np.eye(3), T=np.zeros(3), fov_x=1.2, fov_y=1.2, height=64, width=64
        )
        out = rasterize_mesh(jnp.asarray(verts), jnp.asarray(faces), cam,
                             dup_capacity=1024, k_max=16)
        fidx = np.asarray(out["face_idx"])
        zbuf = np.asarray(out["zbuf"])
        # Center pixel is covered at depth ~2.
        assert fidx[32, 32] >= 0
        np.testing.assert_allclose(zbuf[32, 32], 2.0, rtol=1e-3)
        # Corner pixels are background.
        assert fidx[0, 0] == -1 and zbuf[0, 0] == -1.0
        # Coverage fraction matches the quad's projected area.
        covered = (fidx >= 0).mean()
        assert 0.15 < covered < 0.6

    def test_occlusion(self):
        # Two quads; the nearer one must win the z-buffer.
        v1, f1 = facing_quad(z=2.0, half=0.5)
        v2, f2 = facing_quad(z=4.0, half=0.5)
        verts = np.concatenate([v1, v2])
        faces = np.concatenate([f1, f2 + 4])
        cam = make_camera(
            R=np.eye(3), T=np.zeros(3), fov_x=1.2, fov_y=1.2, height=32, width=32
        )
        out = rasterize_mesh(jnp.asarray(verts), jnp.asarray(faces), cam,
                             dup_capacity=1024, k_max=16)
        center_face = int(np.asarray(out["face_idx"])[16, 16])
        assert center_face in (0, 1)  # near quad
        np.testing.assert_allclose(float(np.asarray(out["zbuf"])[16, 16]), 2.0, rtol=1e-3)

    def test_barycentrics_sum_to_one(self):
        verts, faces = facing_quad()
        cam = make_camera(
            R=np.eye(3), T=np.zeros(3), fov_x=1.2, fov_y=1.2, height=32, width=32
        )
        out = rasterize_mesh(jnp.asarray(verts), jnp.asarray(faces), cam,
                             dup_capacity=1024, k_max=16)
        hit = np.asarray(out["face_idx"]) >= 0
        bary = np.asarray(out["bary"])[hit]
        np.testing.assert_allclose(bary.sum(axis=-1), 1.0, atol=1e-4)
        assert (bary >= -1e-4).all()


class TestUVAtlas:
    def test_atlas_in_bounds_disjoint(self):
        uv, size = build_uv_atlas(10, square_size=10)
        assert uv.shape == (10, 3, 2)
        assert (uv >= 0).all() and (uv <= 1).all()
        # Face pairs occupy distinct squares: centroid texels differ.
        cent = (uv.mean(axis=1) * size).astype(int)
        squares = set()
        for k in range(0, 10, 2):
            sq = (cent[k][0] // 10, cent[k][1] // 10)
            assert sq not in squares
            squares.add(sq)


class TestBakeTexture:
    def test_constant_render_bakes_constant(self):
        verts, faces = facing_quad()
        params, bm = B.init_bound_params(verts, faces, None, 1, extent=1.0, sh_degree=0)
        cam = make_camera(
            R=np.eye(3), T=np.zeros(3), fov_x=1.2, fov_y=1.2, height=48, width=48
        )
        target_color = np.array([0.1, 0.6, 0.9], np.float32)

        def render_fn(c):
            return np.broadcast_to(target_color, (48, 48, 3))

        # square_size >= 10: the atlas's anti-bleed corner insets (+-3 px)
        # leave almost no interior at smaller squares.
        tex, uv, size = bake_texture(params, bm, [cam], render_fn, square_size=12,
                                     raster_dup_capacity=1024)
        # Observed texels carry the render color.
        observed = np.abs(tex - target_color).max(axis=-1) < 1e-4
        assert observed.sum() > 10

    def test_obj_roundtrip(self, tmp_path):
        verts, faces = facing_quad()
        uv, size = build_uv_atlas(2, square_size=6)
        tex = np.random.default_rng(0).uniform(0, 1, (size, size, 3)).astype(np.float32)
        p = str(tmp_path / "m.obj")
        save_obj(p, verts, faces, verts_uv=uv, texture=tex)
        v2, f2, uvs, fuv = load_obj(p)
        np.testing.assert_allclose(v2, verts, atol=1e-6)
        np.testing.assert_array_equal(f2, faces)
        assert uvs is not None and len(uvs) == 6
        assert fuv is not None and fuv.shape == (2, 3)
        import os

        assert os.path.exists(str(tmp_path / "m.png"))
        assert os.path.exists(str(tmp_path / "m.mtl"))


class TestTexturedRenderEval:
    def test_textured_render_roundtrip_through_obj(self, tmp_path):
        """Bake a constant-color texture, export the OBJ, reload it with
        the metrics-CLI UV convention, and render: pixels covered by the
        mesh must show the baked color (the reference's textured-render
        eval object, metrics.py:292-300)."""
        from sugar_tpu.refine.texture import render_textured_mesh

        verts, faces = facing_quad()
        uv, size = build_uv_atlas(len(faces), square_size=10)
        texture = np.full((size, size, 3), [0.2, 0.6, 0.9], np.float32)
        obj_path = str(tmp_path / "tex.obj")
        save_obj(obj_path, verts, faces, verts_uv=uv, texture=texture)

        lv, lf, luv, lfuv = load_obj(obj_path)
        vt = luv[lfuv]
        verts_uv = np.stack([1.0 - vt[..., 1], vt[..., 0]], axis=-1)
        from PIL import Image

        png = obj_path.replace(".obj", ".png")
        tex = np.asarray(Image.open(png)).astype(np.float32)[..., :3] / 255.0

        cam = make_camera(
            R=np.eye(3), T=np.zeros(3), fov_x=1.2, fov_y=1.2, height=48, width=48
        )
        img = render_textured_mesh(
            lv, lf, verts_uv, tex, cam, dup_capacity=1024, k_max=16
        )
        center = img[24, 24]
        np.testing.assert_allclose(center, [0.2, 0.6, 0.9], atol=0.02)
        np.testing.assert_allclose(img[0, 0], 0.0, atol=1e-6)
