"""Parity + gradient tests for the differentiable rasterizer.

Pyramid (SURVEY.md §4): numpy oracle -> pure-JAX reference renderer ->
tile-binned production renderer; finite-difference gradchecks on micro
scenes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oracle_raster import oracle_render
from sugar_tpu.core.cameras import make_camera
from sugar_tpu.raster import common as rc
from sugar_tpu.raster.api import rasterize_gaussians
from sugar_tpu.raster.binning import bin_gaussians
from sugar_tpu.raster.preprocess import preprocess


def make_scene(n=300, seed=0, spread=1.2):
    g = np.random.default_rng(seed)
    means = np.stack(
        [
            g.uniform(-spread, spread, n),
            g.uniform(-spread, spread, n),
            g.uniform(1.0, 6.0, n),
        ],
        axis=-1,
    ).astype(np.float32)
    scales = np.exp(g.uniform(np.log(0.02), np.log(0.25), (n, 3))).astype(np.float32)
    quats = g.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = g.uniform(0.05, 0.95, n).astype(np.float32)
    colors = g.uniform(0, 1, (n, 3)).astype(np.float32)
    return means, scales, quats, opac, colors


def make_settings(h=64, w=80, bg=(0.0, 0.0, 0.0)):
    cam = make_camera(
        R=np.eye(3), T=np.zeros(3), fov_x=1.2, fov_y=1.0, height=h, width=w
    )
    from sugar_tpu.raster.common import from_camera

    return from_camera(cam, bg=jnp.asarray(np.array(bg, np.float32)))


class TestForwardParity:
    def test_reference_vs_oracle(self):
        means, scales, quats, opac, colors = make_scene(n=200, seed=1)
        st = make_settings(h=48, w=64)
        out = rasterize_gaussians(
            jnp.asarray(means),
            jnp.asarray(opac),
            st,
            scales=jnp.asarray(scales),
            quaternions=jnp.asarray(quats),
            colors=jnp.asarray(colors),
            mode="reference",
        )
        oracle = oracle_render(
            means.astype(np.float64),
            scales.astype(np.float64),
            quats.astype(np.float64),
            opac.astype(np.float64),
            colors.astype(np.float64),
            np.asarray(st.viewmatrix, np.float64),
            np.asarray(st.projmatrix, np.float64),
            st.image_width,
            st.image_height,
            st.tanfovx,
            st.tanfovy,
            np.zeros(3),
        )
        np.testing.assert_allclose(out["image"], oracle["image"], atol=2e-4)
        np.testing.assert_allclose(out["final_T"], oracle["final_T"], atol=2e-4)

    def test_tiled_vs_reference(self):
        means, scales, quats, opac, colors = make_scene(n=500, seed=2)
        st = make_settings(h=64, w=80, bg=(0.2, 0.3, 0.4))
        kwargs = dict(
            scales=jnp.asarray(scales),
            quaternions=jnp.asarray(quats),
            colors=jnp.asarray(colors),
        )
        ref = rasterize_gaussians(
            jnp.asarray(means), jnp.asarray(opac), st, mode="reference", **kwargs
        )
        tiled = rasterize_gaussians(
            jnp.asarray(means),
            jnp.asarray(opac),
            st,
            mode="tiled",
            dup_capacity=16 * means.shape[0],
            k_max=512,
            **kwargs,
        )
        assert int(tiled["bin_overflow"]) == 0
        assert int(tiled["tile_overflow"]) == 0
        np.testing.assert_allclose(tiled["image"], ref["image"], atol=1e-5)
        np.testing.assert_allclose(tiled["final_T"], ref["final_T"], atol=1e-5)
        np.testing.assert_allclose(tiled["radii"], ref["radii"])

    def test_tiled_vs_oracle_with_sh(self):
        means, scales, quats, opac, _ = make_scene(n=150, seed=3)
        g = np.random.default_rng(10)
        shs = g.normal(0, 0.3, (150, 3, 9)).astype(np.float32)
        shs[:, :, 0] += 0.8
        st = make_settings(h=48, w=48)
        out = rasterize_gaussians(
            jnp.asarray(means),
            jnp.asarray(opac),
            dataclass_replace(st, sh_degree=2),
            scales=jnp.asarray(scales),
            quaternions=jnp.asarray(quats),
            shs=jnp.asarray(shs),
            mode="tiled",
            dup_capacity=16 * 150,
            k_max=256,
        )
        # Oracle with python-side SH evaluation.
        from sugar_tpu.core import sh as sh_lib

        dirs = means - np.zeros(3)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        colors = np.asarray(
            sh_lib.sh_to_rgb(2, jnp.asarray(shs), jnp.asarray(dirs))
        )
        oracle = oracle_render(
            means.astype(np.float64),
            scales.astype(np.float64),
            quats.astype(np.float64),
            opac.astype(np.float64),
            colors.astype(np.float64),
            np.asarray(st.viewmatrix, np.float64),
            np.asarray(st.projmatrix, np.float64),
            st.image_width,
            st.image_height,
            st.tanfovx,
            st.tanfovy,
            np.zeros(3),
        )
        np.testing.assert_allclose(out["image"], oracle["image"], atol=3e-4)

    def test_empty_scene(self):
        st = make_settings(h=32, w=32, bg=(0.5, 0.6, 0.7))
        means = np.zeros((4, 3), np.float32)
        means[:, 2] = -5.0  # all behind camera
        out = rasterize_gaussians(
            jnp.asarray(means),
            jnp.asarray(np.full(4, 0.9, np.float32)),
            st,
            scales=jnp.asarray(np.full((4, 3), 0.1, np.float32)),
            quaternions=jnp.asarray(np.tile([1, 0, 0, 0], (4, 1)).astype(np.float32)),
            colors=jnp.asarray(np.ones((4, 3), np.float32)),
            mode="tiled",
            dup_capacity=64,
            k_max=16,
        )
        expected = np.broadcast_to(np.array([0.5, 0.6, 0.7]), (32, 32, 3))
        np.testing.assert_allclose(out["image"], expected, atol=1e-6)
        assert np.all(np.asarray(out["radii"]) == 0)

    def test_alive_mask_culls(self):
        means, scales, quats, opac, colors = make_scene(n=100, seed=4)
        st = make_settings()
        mask = np.zeros(100, bool)
        mask[:50] = True
        out_masked = rasterize_gaussians(
            jnp.asarray(means),
            jnp.asarray(opac),
            st,
            scales=jnp.asarray(scales),
            quaternions=jnp.asarray(quats),
            colors=jnp.asarray(colors),
            alive_mask=jnp.asarray(mask),
            mode="tiled",
            dup_capacity=3200,
        )
        out_sub = rasterize_gaussians(
            jnp.asarray(means[:50]),
            jnp.asarray(opac[:50]),
            st,
            scales=jnp.asarray(scales[:50]),
            quaternions=jnp.asarray(quats[:50]),
            colors=jnp.asarray(colors[:50]),
            mode="tiled",
            dup_capacity=3200,
        )
        np.testing.assert_allclose(out_masked["image"], out_sub["image"], atol=1e-6)


def dataclass_replace(obj, **kw):
    import dataclasses

    return dataclasses.replace(obj, **kw)


class TestBinning:
    def test_counts_match_rects(self):
        means, scales, quats, opac, colors = make_scene(n=120, seed=5)
        st = make_settings()
        prep = preprocess(
            jnp.asarray(means),
            jnp.asarray(opac),
            st,
            scales=jnp.asarray(scales),
            quaternions=jnp.asarray(quats),
            colors=jnp.asarray(colors),
        )
        b = bin_gaussians(prep, st, capacity=8192)
        assert int(b.overflow) == 0
        assert int(b.num_rendered) == int(jnp.sum(prep.tiles_touched))
        assert int(jnp.sum(b.tile_count)) == int(b.num_rendered)
        # Depth must be non-decreasing within every tile.
        st_np = np.asarray(b.sorted_tile)
        sg = np.asarray(b.sorted_gauss)
        depth = np.asarray(prep.depth)
        for t in np.unique(st_np):
            if t >= st.tiles_x * st.tiles_y:
                continue
            dsub = depth[sg[st_np == t]]
            assert np.all(np.diff(dsub) >= -1e-6)

    def test_overflow_reported(self):
        means, scales, quats, opac, colors = make_scene(n=120, seed=5)
        st = make_settings()
        prep = preprocess(
            jnp.asarray(means),
            jnp.asarray(opac),
            st,
            scales=jnp.asarray(scales),
            quaternions=jnp.asarray(quats),
            colors=jnp.asarray(colors),
        )
        b = bin_gaussians(prep, st, capacity=16)
        assert int(b.overflow) == int(jnp.sum(prep.tiles_touched)) - 16


class TestGradients:
    def _loss_fn(self, st, target):
        def loss(means, scales, quats, opac, colors):
            out = rasterize_gaussians(
                means,
                opac,
                st,
                scales=scales,
                quaternions=quats,
                colors=colors,
                mode="tiled",
                dup_capacity=2048,
                k_max=64,
            )
            return jnp.mean((out["image"] - target) ** 2)

        return loss

    def test_grads_match_finite_difference(self):
        means, scales, quats, opac, colors = make_scene(n=12, seed=6)
        st = make_settings(h=32, w=32)
        target = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (32, 32, 3)).astype(np.float32))
        loss = self._loss_fn(st, target)
        args = [
            jnp.asarray(means),
            jnp.asarray(scales),
            jnp.asarray(quats),
            jnp.asarray(opac),
            jnp.asarray(colors),
        ]
        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
        # Central finite differences on a subset of coordinates.
        g = np.random.default_rng(1)
        eps = 3e-3
        for argi in range(5):
            a = np.asarray(args[argi], np.float64)
            flat = a.reshape(-1)
            picks = g.choice(flat.size, size=min(6, flat.size), replace=False)
            for p in picks:
                ap = flat.copy()
                am = flat.copy()
                ap[p] += eps
                am[p] -= eps
                args_p = list(args)
                args_m = list(args)
                args_p[argi] = jnp.asarray(ap.reshape(a.shape).astype(np.float32))
                args_m[argi] = jnp.asarray(am.reshape(a.shape).astype(np.float32))
                fd = (float(loss(*args_p)) - float(loss(*args_m))) / (2 * eps)
                an = float(np.asarray(grads[argi]).reshape(-1)[p])
                assert abs(fd - an) < 5e-3 * max(1.0, abs(fd), abs(an)) + 2e-4, (
                    f"arg {argi} coord {p}: fd={fd} analytic={an}"
                )

    def test_ndc_offset_grad(self):
        means, scales, quats, opac, colors = make_scene(n=30, seed=7)
        st = make_settings(h=32, w=32)

        def loss(off):
            out = rasterize_gaussians(
                jnp.asarray(means),
                jnp.asarray(opac),
                st,
                scales=jnp.asarray(scales),
                quaternions=jnp.asarray(quats),
                colors=jnp.asarray(colors),
                ndc_offset=off,
                mode="tiled",
                dup_capacity=2048,
            )
            return jnp.sum(out["image"] ** 2)

        g = jax.grad(loss)(jnp.zeros((30, 2)))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.max(jnp.abs(g))) > 0.0

    def test_no_nan_grads_with_culled(self):
        means, scales, quats, opac, colors = make_scene(n=40, seed=8)
        means[:10, 2] = -2.0  # behind camera
        means[10:15, 2] = 0.1  # inside near-cull band
        st = make_settings(h=32, w=32)
        loss = self._loss_fn(st, jnp.zeros((32, 32, 3)))
        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            jnp.asarray(means),
            jnp.asarray(scales),
            jnp.asarray(quats),
            jnp.asarray(opac),
            jnp.asarray(colors),
        )
        for gr in grads:
            assert np.isfinite(np.asarray(gr)).all()


class TestTileCapFloor:
    def test_derived_tile_cap_floor_keeps_large_splats(self):
        """A legacy caller passing a small dup_capacity (so dup_capacity//N
        is tiny) must not silently clip near-camera splats covering many
        tiles: the derived tile_cap is floored at 16 (raster/api.py)."""
        n = 32
        g = np.random.default_rng(3)
        # One big near splat (covers many tiles) + small background splats.
        means = np.concatenate(
            [
                np.array([[0.0, 0.0, 1.2]], np.float32),
                np.stack(
                    [g.uniform(-1, 1, n - 1), g.uniform(-1, 1, n - 1),
                     g.uniform(3, 6, n - 1)], -1
                ).astype(np.float32),
            ]
        )
        scales = np.full((n, 3), 0.02, np.float32)
        scales[0] = 0.5  # large on screen
        quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
        opac = np.full((n,), 0.8, np.float32)
        colors = g.uniform(0, 1, (n, 3)).astype(np.float32)
        st = make_settings(h=64, w=64)
        args = tuple(jnp.asarray(x) for x in (means, scales, quats, opac, colors))

        ref = rasterize_gaussians(
            args[0], args[3], st, scales=args[1], quaternions=args[2],
            colors=args[4], mode="reference",
        )["image"]
        # dup_capacity // n == 2 < tiles touched by the big splat; the
        # floor(16) keeps parity with the reference render.
        out = rasterize_gaussians(
            args[0], args[3], st, scales=args[1], quaternions=args[2],
            colors=args[4], mode="pallas", dup_capacity=2 * n, k_max=256,
        )
        np.testing.assert_allclose(
            np.asarray(out["image"]), np.asarray(ref), atol=2e-5
        )
