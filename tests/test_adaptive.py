"""Capacity auto-grow (re-jit) protocol: undersized caps must converge to
the exact uncapped image, and CapState must grow on observed overflow.

Reference analog: the CUDA rasterizer's dynamically resized buffers
(rasterizer_impl.cu:155-194) make every render exact regardless of scene
size; render_adaptive reproduces that contract under XLA static shapes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from sugar_tpu.core.cameras import make_camera
from sugar_tpu.raster.adaptive import (
    CapState,
    RasterCaps,
    overflowed,
    read_overflow,
    render_adaptive,
)
from sugar_tpu.raster.api import rasterize_gaussians
from sugar_tpu.raster.common import from_camera


def _scene(n=400, seed=0):
    g = np.random.default_rng(seed)
    means = np.stack(
        [g.uniform(-1.2, 1.2, n), g.uniform(-1.2, 1.2, n), g.uniform(1.5, 6.0, n)], -1
    ).astype(np.float32)
    # A few huge gaussians to force large tile rects (tile_cap overflow).
    scales = np.exp(g.uniform(np.log(0.01), np.log(0.05), (n, 3))).astype(np.float32)
    scales[:5] = 0.6
    quats = g.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = g.uniform(0.3, 0.9, n).astype(np.float32)
    colors = g.uniform(0, 1, (n, 3)).astype(np.float32)
    cam = make_camera(
        R=np.eye(3), T=np.zeros(3), fov_x=1.1, fov_y=1.1, height=64, width=64
    )
    return tuple(jnp.asarray(x) for x in (means, opac, scales, quats, colors)), cam


def _render(means, opac, scales, quats, colors, settings, **caps):
    with pltpu.force_tpu_interpret_mode():
        return rasterize_gaussians(
            means, opac, settings,
            scales=scales, quaternions=quats, colors=colors,
            mode="pallas", **caps,
        )


class TestAdaptive:
    def test_undersized_caps_grow_to_exact_image(self):
        (means, opac, scales, quats, colors), cam = _scene()
        settings = from_camera(cam)
        fn = functools.partial(_render, means, opac, scales, quats, colors, settings)

        # Ground truth: generous capacities, verified overflow-free.
        ref = fn(tile_cap=32, dup_capacity=None, k_max=4096)
        assert not overflowed(read_overflow(ref))

        events = []
        caps0 = RasterCaps(tile_cap=2, dup_capacity=512, k_max=256)
        out, caps = render_adaptive(fn, caps0, log_fn=events.append)
        assert not overflowed(read_overflow(out))
        assert events, "undersized caps must trigger at least one growth"
        np.testing.assert_allclose(
            np.asarray(out["image"]), np.asarray(ref["image"]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["final_T"]), np.asarray(ref["final_T"]), atol=1e-5
        )

    def test_gradients_exact_after_growth(self):
        (means, opac, scales, quats, colors), cam = _scene(n=200, seed=1)
        settings = from_camera(cam)

        def loss(caps_kw, m):
            out = _render(m, opac, scales, quats, colors, settings, **caps_kw)
            return jnp.sum(out["image"] ** 2)

        fn = functools.partial(
            _render, means, opac, scales, quats, colors, settings
        )
        _, caps = render_adaptive(fn, RasterCaps(tile_cap=2, dup_capacity=512, k_max=256))
        with pltpu.force_tpu_interpret_mode():
            g_grown = jax.grad(
                lambda m: loss(
                    dict(tile_cap=caps.tile_cap, dup_capacity=caps.dup_capacity,
                         k_max=caps.k_max), m)
            )(means)
            g_ref = jax.grad(
                lambda m: loss(dict(tile_cap=32, dup_capacity=None, k_max=4096), m)
            )(means)
        np.testing.assert_allclose(
            np.asarray(g_grown), np.asarray(g_ref), atol=1e-4
        )

    def test_capacity_truncation_zeroes_grads_not_garbage(self):
        # With cap_overflow > 0 the counts-derived segment offsets are
        # invalid; gather_dup must return zero parameter grads rather than
        # misattributed ones.
        (means, opac, scales, quats, colors), cam = _scene(n=200, seed=2)
        settings = from_camera(cam)

        def loss(m):
            out = _render(
                m, opac, scales, quats, colors, settings,
                tile_cap=8, dup_capacity=256, k_max=1024,
            )
            return jnp.sum(out["image"] ** 2), out

        with pltpu.force_tpu_interpret_mode():
            (l, out), g = jax.value_and_grad(loss, has_aux=True)(means)
        assert int(out["cap_overflow"]) > 0
        assert np.isfinite(np.asarray(g)).all()
        np.testing.assert_array_equal(np.asarray(g), 0.0)

    def test_capstate_grows_and_rekeys(self):
        (means, opac, scales, quats, colors), cam = _scene(n=200, seed=3)
        settings = from_camera(cam)
        st = CapState(RasterCaps(tile_cap=2, dup_capacity=512, k_max=256))
        out = _render(
            means, opac, scales, quats, colors, settings,
            tile_cap=st.caps.tile_cap, dup_capacity=st.caps.dup_capacity,
            k_max=st.caps.k_max,
        )
        k0 = st.key()
        changed = st.observe(out)
        assert changed and st.key() != k0 and st.version == 1
        # Converges: after a few rounds no more growth.
        for _ in range(8):
            out = _render(
                means, opac, scales, quats, colors, settings,
                tile_cap=st.caps.tile_cap, dup_capacity=st.caps.dup_capacity,
                k_max=st.caps.k_max,
            )
            if not st.observe(out):
                break
        assert not overflowed(read_overflow(out))
