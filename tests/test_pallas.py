"""Pallas kernel parity vs the pure-JAX tiled path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from test_raster import make_scene, make_settings
from sugar_tpu.raster.api import rasterize_gaussians


@pytest.fixture(autouse=True)
def _interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


class TestPallasForward:
    def test_matches_tiled(self):
        means, scales, quats, opac, colors = make_scene(n=400, seed=2)
        st = make_settings(h=64, w=80, bg=(0.2, 0.3, 0.4))
        kwargs = dict(
            scales=jnp.asarray(scales),
            quaternions=jnp.asarray(quats),
            colors=jnp.asarray(colors),
            dup_capacity=8192,
            k_max=512,
        )
        ref = rasterize_gaussians(
            jnp.asarray(means), jnp.asarray(opac), st, mode="tiled", **kwargs
        )
        pal = rasterize_gaussians(
            jnp.asarray(means), jnp.asarray(opac), st, mode="pallas", **kwargs
        )
        np.testing.assert_allclose(pal["image"], ref["image"], atol=1e-5)
        np.testing.assert_allclose(pal["final_T"], ref["final_T"], atol=1e-5)
        np.testing.assert_array_equal(pal["n_contrib"], ref["n_contrib"])

    def test_overflow_clip_matches_kmax(self):
        # Tiles with more gaussians than max_per_tile keep the nearest ones,
        # same as the tiled path's k_max clip.
        means, scales, quats, opac, colors = make_scene(n=300, seed=5)
        st = make_settings(h=32, w=32)
        kwargs = dict(
            scales=jnp.asarray(scales),
            quaternions=jnp.asarray(quats),
            colors=jnp.asarray(colors),
            dup_capacity=8192,
            k_max=256,  # one chunk
        )
        ref = rasterize_gaussians(
            jnp.asarray(means), jnp.asarray(opac), st, mode="tiled", **kwargs
        )
        pal = rasterize_gaussians(
            jnp.asarray(means), jnp.asarray(opac), st, mode="pallas", **kwargs
        )
        np.testing.assert_allclose(pal["image"], ref["image"], atol=1e-5)


class TestPallasBackward:
    def test_grads_match_tiled_autodiff(self):
        means, scales, quats, opac, colors = make_scene(n=200, seed=3)
        st = make_settings(h=48, w=64, bg=(0.1, 0.2, 0.3))
        target = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (48, 64, 3)).astype(np.float32)
        )

        def make_loss(mode):
            def f(m, s, q, o, c):
                out = rasterize_gaussians(
                    m, o, st, scales=s, quaternions=q, colors=c,
                    mode=mode, dup_capacity=8192, k_max=512,
                )
                return jnp.mean((out["image"] - target) ** 2) + 0.1 * jnp.mean(
                    out["final_T"]
                )

            return f

        args = tuple(jnp.asarray(x) for x in (means, scales, quats, opac, colors))
        g_ref = jax.grad(make_loss("tiled"), argnums=(0, 1, 2, 3, 4))(*args)
        g_pal = jax.grad(make_loss("pallas"), argnums=(0, 1, 2, 3, 4))(*args)
        for a, b in zip(g_ref, g_pal):
            ref_scale = max(float(jnp.max(jnp.abs(a))), 1e-8)
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-5 * ref_scale + 1e-9
            )

    def test_ndc_offset_grad_flows(self):
        means, scales, quats, opac, colors = make_scene(n=60, seed=7)
        st = make_settings(h=32, w=32)

        def f(off):
            out = rasterize_gaussians(
                jnp.asarray(means), jnp.asarray(opac), st,
                scales=jnp.asarray(scales), quaternions=jnp.asarray(quats),
                colors=jnp.asarray(colors), ndc_offset=off,
                mode="pallas", dup_capacity=4096, k_max=256,
            )
            return jnp.sum(out["image"] ** 2)

        g = jax.grad(f)(jnp.zeros((60, 2)))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.max(jnp.abs(g))) > 0.0
