"""Tests: COLMAP parsers, dataset loaders, cameras.json, viewer export."""

import json
import os
import struct

import numpy as np
import pytest

from sugar_tpu.io import colmap as cm
from sugar_tpu.io import datasets as ds


def write_colmap_binary(sparse_dir, cams, imgs, pts):
    os.makedirs(sparse_dir, exist_ok=True)
    with open(os.path.join(sparse_dir, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(cams)))
        for c in cams:
            model_id = {v[0]: k for k, v in cm.CAMERA_MODELS.items()}[c.model]
            f.write(struct.pack("<iiQQ", c.camera_id, model_id, c.width, c.height))
            f.write(struct.pack(f"<{len(c.params)}d", *c.params))
    with open(os.path.join(sparse_dir, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(imgs)))
        for im in imgs:
            f.write(struct.pack("<idddddddi", im.image_id, *im.qvec, *im.tvec, im.camera_id))
            f.write(im.name.encode() + b"\x00")
            f.write(struct.pack("<Q", 2))  # two 2D points
            for _ in range(2):
                f.write(struct.pack("<ddq", 1.0, 2.0, -1))
    xyz, rgb, err = pts
    with open(os.path.join(sparse_dir, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(xyz)))
        for i in range(len(xyz)):
            f.write(struct.pack("<QdddBBBd", i + 1, *xyz[i], *rgb[i], err[i]))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))


@pytest.fixture
def colmap_scene(tmp_path):
    g = np.random.default_rng(0)
    q = g.normal(size=4)
    q /= np.linalg.norm(q)
    cams = [cm.ColmapCamera(1, "PINHOLE", 64, 48, np.array([60.0, 60.0, 32.0, 24.0]))]
    imgs = [
        cm.ColmapImage(1, q, np.array([0.1, 0.2, 2.0]), 1, "a.png"),
        cm.ColmapImage(2, np.array([1.0, 0, 0, 0]), np.array([0.0, 0.0, 3.0]), 1, "b.png"),
    ]
    xyz = g.normal(size=(20, 3))
    rgb = g.integers(0, 255, (20, 3)).astype(np.uint8)
    err = g.random(20)
    sparse = str(tmp_path / "sparse" / "0")
    write_colmap_binary(sparse, cams, imgs, (xyz, rgb, err))
    # Dummy images.
    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    for n in ("a.png", "b.png"):
        Image.fromarray(np.zeros((48, 64, 3), np.uint8)).save(str(img_dir / n))
    return str(tmp_path), cams, imgs, xyz


class TestColmap:
    def test_binary_roundtrip(self, colmap_scene):
        root, cams, imgs, xyz = colmap_scene
        c2, i2, (p_xyz, p_rgb, _) = cm.read_model(os.path.join(root, "sparse", "0"))
        assert c2[1].model == "PINHOLE"
        np.testing.assert_allclose(c2[1].params, cams[0].params)
        assert i2[1].name == "a.png"
        np.testing.assert_allclose(i2[1].qvec, imgs[0].qvec, atol=1e-12)
        np.testing.assert_allclose(p_xyz, xyz)

    def test_text_roundtrip(self, tmp_path):
        cams = {1: cm.ColmapCamera(1, "SIMPLE_PINHOLE", 10, 10, np.array([5.0, 5.0, 5.0]))}
        imgs = {
            7: cm.ColmapImage(7, np.array([1.0, 0, 0, 0]), np.array([1.0, 2, 3]), 1, "x.jpg")
        }
        cm.write_cameras_text(str(tmp_path / "cameras.txt"), cams)
        cm.write_images_text(str(tmp_path / "images.txt"), imgs)
        cm.write_points3d_text(
            str(tmp_path / "points3D.txt"),
            np.ones((3, 3)),
            np.full((3, 3), 7, np.uint8),
        )
        c2 = cm.read_cameras_text(str(tmp_path / "cameras.txt"))
        i2 = cm.read_images_text(str(tmp_path / "images.txt"))
        xyz, rgb, _ = cm.read_points3d_text(str(tmp_path / "points3D.txt"))
        assert c2[1].model == "SIMPLE_PINHOLE"
        assert i2[7].name == "x.jpg"
        np.testing.assert_allclose(xyz, 1.0)

    def test_qvec2rotmat_orthonormal(self):
        q = np.array([0.5, 0.5, 0.5, 0.5])
        R = cm.qvec2rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)


class TestSceneLoading:
    def test_load_colmap_scene(self, colmap_scene):
        root, *_ = colmap_scene
        scene = ds.load_colmap_scene(root)
        assert len(scene.cameras) == 2
        assert scene.cameras[0].width == 64
        assert scene.images[0].shape == (48, 64, 3)
        assert scene.points.shape == (20, 3)
        assert scene.extent > 0
        tr, te = scene.split(True)
        assert te == [0] and tr == [1]

    def test_camera_json_roundtrip(self, colmap_scene, tmp_path):
        root, *_ = colmap_scene
        scene = ds.load_colmap_scene(root)
        jpath = str(tmp_path / "cameras.json")
        ds.save_cameras_json(jpath, scene.cameras, [n.split(".")[0] for n in scene.image_names])
        with open(jpath) as f:
            data = json.load(f)
        assert len(data) == 2
        # reload through the gs-checkpoint loader
        scene2 = ds.load_gs_checkpoint_cameras(root, str(tmp_path), load_images=False)
        np.testing.assert_allclose(
            np.asarray(scene2.cameras[0].world_view),
            np.asarray(scene.cameras[0].world_view),
            atol=1e-4,
        )

    def test_downscale_cap(self):
        assert ds._downscale_factor(3840, 2160, 1, 1920) == 2.0
        assert ds._downscale_factor(1920, 1080, 2, 1920) == 2.0
        assert ds._downscale_factor(640, 480, 1, 1920) == 1.0


class TestViewerExport:
    def test_scene_descriptor(self, tmp_path):
        from sugar_tpu.viewer.export import write_scene_descriptor

        ply = tmp_path / "m.ply"
        ply.write_bytes(b"ply")
        out = write_scene_descriptor(str(tmp_path / "viewer"), str(ply))
        with open(out) as f:
            desc = json.load(f)
        assert desc["ply"].endswith("m.ply")
        with pytest.raises(FileNotFoundError):
            write_scene_descriptor(str(tmp_path / "v2"), str(tmp_path / "missing.ply"))
