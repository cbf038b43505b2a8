"""Tests for auxiliary subsystems: checkpointing, profiling, network GUI
protocol, Blender interop, compositor."""

import json
import socket
import struct
import threading

import os

import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from sugar_tpu.models.gaussians import create_from_pcd
        from sugar_tpu.trainers import optimizer as opt
        from sugar_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

        g = np.random.default_rng(0)
        m = create_from_pcd(
            g.normal(size=(16, 3)).astype(np.float32),
            g.uniform(0, 1, (16, 3)).astype(np.float32),
            capacity=32,
            sh_degree=1,
        )
        adam = opt.init_adam(m.params)
        state = dict(params=m.params, alive=m.alive, adam=adam, iteration=jnp.asarray(123))
        p = str(tmp_path / "ckpt")
        save_checkpoint(p, state)
        restored = load_checkpoint(p, state)
        np.testing.assert_allclose(
            np.asarray(restored["params"]["xyz"]), np.asarray(m.params.xyz)
        )
        assert int(np.asarray(restored["iteration"])) == 123

    def test_milestone_path(self):
        from sugar_tpu.utils.checkpoint import milestone_path

        assert milestone_path("/x", 15000).endswith("milestone_15000")


class TestProfiling:
    def test_stage_timer(self):
        from sugar_tpu.utils.profiling import StageTimer

        t = StageTimer()
        with t.time("a"):
            x = jnp.zeros(8) + 1
        with t.time("a", block_on=x):
            pass
        s = t.summary()
        assert s["a"]["count"] == 2
        assert s["a"]["total_s"] >= 0


class TestNetworkGUI:
    def test_protocol_roundtrip(self):
        from sugar_tpu.viewer.network_gui import NetworkGUI

        gui = NetworkGUI(port=0)
        host, port = gui.listener.getsockname()

        h = w = 4
        msg = dict(
            resolution_x=w, resolution_y=h, fov_x=1.0, fov_y=1.0,
            view_matrix=list(np.eye(4).reshape(-1)),
            view_projection_matrix=list(np.eye(4).reshape(-1)),
        )
        received = {}

        def client():
            c = socket.create_connection((host, port), timeout=5)
            payload = json.dumps(msg).encode()
            c.sendall(struct.pack("<I", len(payload)) + payload)
            data = b""
            while len(data) < h * w * 3:
                data += c.recv(4096)
            received["img"] = data[: h * w * 3]
            c.close()

        th = threading.Thread(target=client)
        th.start()
        import time

        # Generous deadline: under CPU contention the client thread can be
        # starved for seconds; the poll itself is non-blocking.
        deadline = time.time() + 30.0
        while time.time() < deadline:
            out = gui.poll(lambda m: np.full((h, w, 3), 0.5))
            if out is not None:
                break
            time.sleep(0.02)
        th.join(timeout=5)
        gui.close()
        assert out is not None
        img = np.frombuffer(received["img"], np.uint8)
        assert (img == 127).all() or (img == 128).all()

    def test_camera_from_message(self):
        from sugar_tpu.viewer.network_gui import camera_from_message

        msg = dict(
            resolution_x=32, resolution_y=24, fov_x=1.0, fov_y=0.8,
            view_matrix=list(np.eye(4).reshape(-1)),
            view_projection_matrix=list(np.eye(4).reshape(-1)),
        )
        cam = camera_from_message(msg)
        assert cam.width == 32 and cam.height == 24
        np.testing.assert_allclose(np.asarray(cam.cam_center), 0.0, atol=1e-6)


class TestBlenderInterop:
    def test_trajectory(self, tmp_path):
        from sugar_tpu.io.blender_interop import load_camera_trajectory

        m = np.eye(4)
        m[2, 3] = 3.0  # camera at z=3 (Blender axes)
        p = str(tmp_path / "traj.json")
        with open(p, "w") as f:
            json.dump(dict(frames=[dict(matrix_world=m.tolist(), lens=50.0)]), f)
        cams = load_camera_trajectory(p, height=48, width=64)
        assert len(cams) == 1
        np.testing.assert_allclose(
            np.asarray(cams[0].cam_center), [0, 0, 3.0], atol=1e-5
        )

    def test_animation_transforms(self, tmp_path):
        from sugar_tpu.io.blender_interop import load_animation_transforms

        p = str(tmp_path / "anim.json")
        with open(p, "w") as f:
            json.dump(
                [[dict(R=np.eye(3).tolist(), t=[1, 2, 3])]], f
            )
        frames = load_animation_transforms(p)
        assert len(frames) == 1
        np.testing.assert_allclose(frames[0][0]["t"], [1, 2, 3])


class TestCompositor:
    def test_two_sets_composite(self):
        from sugar_tpu.core.cameras import make_camera
        from sugar_tpu.models.compositor import GaussianSet, composite_render

        g = np.random.default_rng(0)

        def mk(shift_x, color):
            n = 30
            centers = g.normal(size=(n, 3)).astype(np.float32) * 0.2
            centers[:, 0] += shift_x
            centers[:, 2] += 3.0
            return GaussianSet(
                centers=jnp.asarray(centers),
                scales=jnp.full((n, 3), 0.1),
                quaternions=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (n, 1)),
                opacities=jnp.full((n,), 0.9),
                colors=jnp.tile(jnp.asarray([color]), (n, 1)),
            )

        cam = make_camera(R=np.eye(3), T=np.zeros(3), fov_x=1.2, fov_y=1.2, height=32, width=32)
        out = composite_render(
            [mk(-0.7, [1.0, 0, 0]), mk(0.7, [0.0, 0, 1.0])], cam, k_max=128
        )
        img = np.asarray(out["image"])
        # Left half red-dominant, right half blue-dominant.
        assert img[:, :16, 0].sum() > img[:, :16, 2].sum()
        assert img[:, 16:, 2].sum() > img[:, 16:, 0].sum()

    def test_transform_applied(self):
        from sugar_tpu.core.cameras import make_camera
        from sugar_tpu.models.compositor import GaussianSet, composite_render

        s = GaussianSet(
            centers=jnp.asarray([[0.0, 0, 3.0]]),
            scales=jnp.full((1, 3), 0.15),
            quaternions=jnp.asarray([[1.0, 0, 0, 0]]),
            opacities=jnp.asarray([0.95]),
            colors=jnp.asarray([[1.0, 1, 1]]),
            transform_R=jnp.eye(3),
            transform_t=jnp.asarray([0.8, 0.0, 0.0]),
        )
        cam = make_camera(R=np.eye(3), T=np.zeros(3), fov_x=1.2, fov_y=1.2, height=32, width=32)
        img = np.asarray(composite_render([s], cam, k_max=32)["image"])
        # Blob renders on the right side after the +x translation.
        assert img[:, 16:].sum() > img[:, :16].sum()


class TestLPIPS:
    def test_lpips_runs_with_synthetic_weights(self, tmp_path):
        import numpy as np

        from sugar_tpu.eval.metrics import _VGG_CFG, make_lpips

        rng = np.random.default_rng(0)
        w = {}
        idx = 0
        cin = 3
        slice_channels = []
        for c in _VGG_CFG:
            if c == "M":
                idx += 1
            else:
                w[f"features.{idx}.weight"] = rng.normal(
                    scale=0.05, size=(c, cin, 3, 3)
                ).astype(np.float32)
                w[f"features.{idx}.bias"] = np.zeros((c,), np.float32)
                cin = c
                idx += 2
                if idx - 1 in (3, 8, 15, 22, 29):
                    slice_channels.append(c)
        for k, c in enumerate(slice_channels):
            w[f"lin{k}"] = np.full((c,), 1.0 / c, np.float32)
        path = str(tmp_path / "lpips.npz")
        np.savez(path, **w)

        lp = make_lpips(path)
        a = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
        b = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
        assert float(lp(a, a)) < 1e-6
        d = float(lp(a, b))
        assert np.isfinite(d) and d > 0

    def test_lpips_missing_weights_gates_off(self):
        from sugar_tpu.eval.metrics import make_lpips

        assert make_lpips("/nonexistent/path.npz") is None

    def test_trainer_serves_protocol_round(self, tmp_path):
        """train_vanilla_3dgs polls the GUI each iteration: a client that
        connects mid-training receives a live render (reference
        train.py:52-65)."""
        import jax.numpy as jnp

        from sugar_tpu.core.cameras import make_camera
        from sugar_tpu.trainers.vanilla import TrainConfig, train_vanilla_3dgs
        from sugar_tpu.viewer.network_gui import NetworkGUI

        gui = NetworkGUI(port=0)
        host, port = gui.listener.getsockname()
        h = w = 8
        msg = dict(
            resolution_x=w, resolution_y=h, fov_x=1.0, fov_y=1.0,
            view_matrix=list(np.eye(4, dtype=np.float64).reshape(-1)),
            view_projection_matrix=list(np.eye(4).reshape(-1)),
        )
        received = {}

        def client():
            c = socket.create_connection((host, port), timeout=30)
            payload = json.dumps(msg).encode()
            c.sendall(struct.pack("<I", len(payload)) + payload)
            data = b""
            while len(data) < h * w * 3:
                chunk = c.recv(4096)
                if not chunk:
                    break
                data += chunk
            received["img"] = data[: h * w * 3]
            c.close()

        th = threading.Thread(target=client)
        th.start()

        g = np.random.default_rng(0)
        pts = g.normal(size=(32, 3)).astype(np.float32) * 0.3 + [0, 0, 3]
        cols = np.full((32, 3), 0.5, np.float32)
        cam = make_camera(
            R=np.eye(3), T=np.zeros(3), fov_x=1.0, fov_y=1.0, height=16, width=16
        )
        gt = np.full((16, 16, 3), 0.4, np.float32)
        cfg = TrainConfig(
            iterations=300, sh_degree=0, capacity=64, densify_from=10_000,
            densify_until=10_000, opacity_reset_every=10_000,
            k_max=64, log_every=1_000, checkpoint_iterations=(),
        )
        train_vanilla_3dgs(
            [cam], [gt], pts, cols, extent=1.0, cfg=cfg, network_gui=gui
        )
        th.join(timeout=10)
        gui.close()
        assert "img" in received and len(received["img"]) == h * w * 3


class TestComposeAnimation:
    def test_animation_frames_end_to_end(self, tmp_path):
        """compose_animation CLI: two PLYs + trajectory + per-frame rigid
        transforms -> PNG frames (sugar_compositor.py:12-245 flow)."""
        import subprocess
        import sys

        import jax.numpy as jnp

        from sugar_tpu.models.gaussians import create_from_pcd, save_ply

        g = np.random.default_rng(0)
        pts = (0.3 * g.normal(size=(20, 3))).astype(np.float32) + [0, 0, 3]
        cols = np.full((20, 3), 0.7, np.float32)
        m = create_from_pcd(pts, cols, capacity=20, sh_degree=0,
                            initial_opacity=0.9)
        ply1 = str(tmp_path / "a.ply")
        ply2 = str(tmp_path / "b.ply")
        save_ply(m, ply1)
        save_ply(m, ply2)

        c2w = np.eye(4)
        c2w[:3, 1:3] *= -1  # Blender axes (loader flips back)
        traj = [dict(matrix_world=c2w.reshape(-1).tolist(), lens=35.0)
                for _ in range(2)]
        anim = [
            [dict(R=np.eye(3).tolist(), t=[0, 0, 0]),
             dict(R=np.eye(3).tolist(), t=[0.5, 0, 0])]
            for _ in range(2)
        ]
        tr_path = tmp_path / "traj.json"
        an_path = tmp_path / "anim.json"
        tr_path.write_text(json.dumps(traj))
        an_path.write_text(json.dumps(anim))

        out_dir = tmp_path / "frames"
        env = dict(JAX_PLATFORMS="cpu", PATH=os.environ["PATH"],
                   HOME=os.environ.get("HOME", "/root"))
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/compose_animation.py"),
             "--ply", ply1, "--ply", ply2,
             "--trajectory", str(tr_path), "--animation", str(an_path),
             "--height", "32", "--width", "32", "--k_max", "64",
             "-o", str(out_dir)],
            env=env, capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        frames = sorted(out_dir.glob("frame_*.png"))
        assert len(frames) == 2
        from PIL import Image

        img = np.asarray(Image.open(frames[0]))
        assert img.shape == (32, 32, 3)
        assert img.max() > 0  # something rendered


class TestLPIPSCalibration:
    def test_weights_calibrated_flag_and_filename(self, tmp_path):
        import numpy as np

        from sugar_tpu.eval.metrics import _weights_calibrated

        cal = str(tmp_path / "w.npz")
        np.savez(cal, calibrated=np.asarray(1, np.int32))
        assert _weights_calibrated(cal)

        uncal = str(tmp_path / "w2.npz")
        np.savez(uncal, calibrated=np.asarray(0, np.int32))
        assert not _weights_calibrated(uncal)

        # filename marker wins even without the flag
        named = str(tmp_path / "w.uncalibrated.npz")
        np.savez(named, lin0=np.zeros(3, np.float32))
        assert not _weights_calibrated(named)

        # legacy file with no flag: trusted
        legacy = str(tmp_path / "legacy.npz")
        np.savez(legacy, lin0=np.zeros(3, np.float32))
        assert _weights_calibrated(legacy)

    def test_evaluate_renders_labels_uncalibrated(self, tmp_path):
        import numpy as np

        from sugar_tpu.eval.metrics import _VGG_CFG, evaluate_renders

        rng = np.random.default_rng(0)
        w = {}
        idx = 0
        cin = 3
        slice_channels = []
        for c in _VGG_CFG:
            if c == "M":
                idx += 1
            else:
                w[f"features.{idx}.weight"] = rng.normal(
                    scale=0.05, size=(c, cin, 3, 3)
                ).astype(np.float32)
                w[f"features.{idx}.bias"] = np.zeros((c,), np.float32)
                cin = c
                idx += 2
                if idx - 1 in (3, 8, 15, 22, 29):
                    slice_channels.append(c)
        for k, c in enumerate(slice_channels):
            w[f"lin{k}"] = np.full((c,), 1.0 / c, np.float32)
        w["calibrated"] = np.asarray(0, np.int32)
        path = str(tmp_path / "w.npz")
        np.savez(path, **w)

        imgs = [rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)]
        out = evaluate_renders(lambda i: imgs[i], imgs, [0], path)
        assert "lpips" not in out
        assert "lpips_uncalibrated" in out
