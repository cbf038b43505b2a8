"""Tests: Gaussian model, PLY contract, optimizer schedule, densifier."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sugar_tpu.models import densifier as dens
from sugar_tpu.models.gaussians import (
    GaussianModel,
    GaussianParams,
    create_from_pcd,
    inverse_sigmoid,
    load_ply,
    save_ply,
)
from sugar_tpu.trainers import optimizer as opt


def small_model(n=32, capacity=64, seed=0, sh_degree=1):
    g = np.random.default_rng(seed)
    pts = g.normal(size=(n, 3)).astype(np.float32)
    cols = g.uniform(0, 1, (n, 3)).astype(np.float32)
    return create_from_pcd(pts, cols, capacity, sh_degree=sh_degree)


class TestModel:
    def test_create_from_pcd(self):
        m = small_model()
        assert m.capacity == 64
        assert int(m.n_alive) == 32
        assert np.allclose(np.asarray(m.opacities)[:32], 0.1, atol=1e-5)
        # scale init: log(sqrt(mean 3-NN sq dist)) — positive finite scales.
        s = np.asarray(m.scales)[:32]
        assert np.isfinite(s).all() and (s > 0).all()
        assert np.allclose(s[:, 0], s[:, 1])  # isotropic init

    def test_ply_roundtrip(self, tmp_path):
        m = small_model(sh_degree=3)
        p = str(tmp_path / "g.ply")
        save_ply(m, p)
        m2 = load_ply(p, sh_degree=3)
        a = np.asarray(m.alive)
        np.testing.assert_allclose(
            np.asarray(m2.params.xyz)[: int(m2.n_alive)],
            np.asarray(m.params.xyz)[a],
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(m2.params.sh_rest)[: int(m2.n_alive)],
            np.asarray(m.params.sh_rest)[a],
            rtol=1e-6,
        )

    def test_ply_header_contract(self, tmp_path):
        # The header must match the reference attribute list byte-for-byte
        # (gaussian_model.py:177-189) for viewer interop.
        m = small_model(sh_degree=3)
        p = str(tmp_path / "g.ply")
        save_ply(m, p)
        with open(p, "rb") as f:
            head = f.read(4096).split(b"end_header")[0].decode()
        expected = (
            ["x", "y", "z", "nx", "ny", "nz"]
            + [f"f_dc_{i}" for i in range(3)]
            + [f"f_rest_{i}" for i in range(45)]
            + ["opacity"]
            + [f"scale_{i}" for i in range(3)]
            + [f"rot_{i}" for i in range(4)]
        )
        props = [
            line.split()[-1]
            for line in head.splitlines()
            if line.startswith("property")
        ]
        assert props == expected


class TestOptimizer:
    def test_expon_schedule_endpoints(self):
        s = opt.expon_lr_schedule(1e-2, 1e-4, 100)
        np.testing.assert_allclose(float(s(0)), 1e-2, rtol=1e-5)
        np.testing.assert_allclose(float(s(100)), 1e-4, rtol=1e-5)
        np.testing.assert_allclose(float(s(50)), 1e-3, rtol=1e-5)  # log-linear

    def test_adam_matches_reference_formula(self):
        m = small_model()
        adam = opt.init_adam(m.params)
        lrs = opt.group_lrs(opt.OptimConfig(), spatial_lr_scale=1.0)
        grads = jax.tree.map(jnp.ones_like, m.params)
        p1, a1 = opt.adam_step(m.params, grads, adam, jnp.asarray(0), lrs, opt.OptimConfig())
        # First step of Adam moves each param by exactly -lr (bias-corrected
        # moments equal the gradient; eps=1e-15 negligible for unit grads).
        dx = np.asarray(p1.xyz - m.params.xyz)
        np.testing.assert_allclose(dx, -0.00016, rtol=1e-3)
        d_rest = np.asarray(p1.sh_rest - m.params.sh_rest)
        np.testing.assert_allclose(d_rest, -0.0025 / 20, rtol=1e-3)
        assert int(a1.count) == 1


class TestDensifier:
    def _setup(self, capacity=64, n=16):
        m = small_model(n=n, capacity=capacity)
        adam = opt.init_adam(m.params)
        # Put nonzero moments so surgery is observable.
        adam = dataclasses.replace(
            adam, mu=jax.tree.map(lambda x: jnp.ones_like(x), adam.mu)
        )
        stats = dens.DensifyStats.zeros(capacity)
        return m, adam, stats

    def test_clone_small_high_grad(self):
        m, adam, stats = self._setup()
        # Gaussian 0: high grad, small scale -> clone.
        stats = dataclasses.replace(
            stats,
            grad_accum=stats.grad_accum.at[0].set(1.0),
            denom=stats.denom.at[0].set(1.0),
        )
        # force small scales for 0
        p = dataclasses.replace(
            m.params, log_scales=m.params.log_scales.at[0].set(jnp.log(1e-4))
        )
        m = dataclasses.replace(m, params=p)
        m2, adam2, _, info = dens.densify_and_prune(
            m, adam, stats, jax.random.PRNGKey(0), extent=1.0
        )
        assert int(info["n_cloned"]) == 1
        assert int(info["n_split"]) == 0
        assert int(m2.n_alive) == int(m.n_alive) + 1
        # the clone landed in slot 16 (first free) with identical params
        np.testing.assert_allclose(
            np.asarray(m2.params.xyz[16]), np.asarray(m.params.xyz[0])
        )
        # Adam moments zeroed at the new slot.
        assert float(jnp.sum(jnp.abs(adam2.mu.xyz[16]))) == 0.0
        assert float(jnp.sum(jnp.abs(adam2.mu.xyz[0]))) > 0.0

    def test_split_large_high_grad(self):
        m, adam, stats = self._setup()
        stats = dataclasses.replace(
            stats,
            grad_accum=stats.grad_accum.at[3].set(1.0),
            denom=stats.denom.at[3].set(1.0),
        )
        p = dataclasses.replace(
            m.params, log_scales=m.params.log_scales.at[3].set(jnp.log(0.5))
        )
        m = dataclasses.replace(m, params=p)
        m2, adam2, _, info = dens.densify_and_prune(
            m, adam, stats, jax.random.PRNGKey(0), extent=1.0
        )
        assert int(info["n_split"]) == 1
        # parent pruned, 2 children: net +1. The parent's freed slot may be
        # reused by a child — identify children by their scale = parent/1.6.
        assert int(m2.n_alive) == int(m.n_alive) + 1
        scales2 = np.asarray(jnp.exp(m2.params.log_scales))
        alive2 = np.asarray(m2.alive)
        child_slots = [
            i
            for i in range(64)
            if alive2[i] and np.allclose(scales2[i], 0.5 / 1.6, rtol=1e-5)
        ]
        assert len(child_slots) == 2
        # children positions differ from the parent (sampled)
        for s in child_slots:
            assert not np.allclose(
                np.asarray(m2.params.xyz[s]), np.asarray(m.params.xyz[3])
            )

    def test_prune_low_opacity(self):
        m, adam, stats = self._setup()
        p = dataclasses.replace(
            m.params,
            opacity_logit=m.params.opacity_logit.at[5].set(
                float(inverse_sigmoid(0.001))
            ),
        )
        m = dataclasses.replace(m, params=p)
        m2, _, _, info = dens.densify_and_prune(
            m, adam, stats, jax.random.PRNGKey(0), extent=1.0
        )
        assert not bool(m2.alive[5])
        assert int(info["n_pruned"]) == 1

    def test_capacity_overflow_reported(self):
        m, adam, stats = self._setup(capacity=17, n=16)
        stats = dataclasses.replace(
            stats,
            grad_accum=stats.grad_accum.at[:5].set(1.0),
            denom=stats.denom.at[:5].set(1.0),
        )
        p = dataclasses.replace(
            m.params, log_scales=jnp.full_like(m.params.log_scales, jnp.log(1e-4))
        )
        m = dataclasses.replace(m, params=p)
        m2, _, _, info = dens.densify_and_prune(
            m, adam, stats, jax.random.PRNGKey(0), extent=1.0
        )
        # 5 clone candidates, only 1 free slot -> 4 dropped.
        assert int(info["n_cloned"]) == 1
        assert int(info["n_dropped"]) == 4
        assert int(m2.n_alive) == 17

    def test_reset_opacity(self):
        m, adam, _ = self._setup()
        m2, adam2 = dens.reset_opacity(m, adam)
        op = np.asarray(jax.nn.sigmoid(m2.params.opacity_logit))[:16]
        assert (op <= 0.0101).all()
        assert float(jnp.sum(jnp.abs(adam2.mu.opacity_logit))) == 0.0

    def test_densify_under_jit(self):
        m, adam, stats = self._setup()
        f = jax.jit(
            lambda m_, a_, s_, r_: dens.densify_and_prune(m_, a_, s_, r_, 1.0)
        )
        m2, adam2, stats2, info = f(m, adam, stats, jax.random.PRNGKey(0))
        assert int(m2.n_alive) == 16
