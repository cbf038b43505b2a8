"""Deterministic per-iteration schedules (camera order, RNG) for trainers.

The reference trainers draw a fresh random camera permutation per epoch and
consume it sequentially (gaussian_splatting/train.py:76-78,
coarse_sdf.py:471-484). For checkpoint/resume (SURVEY.md §5), the TPU
trainers need the camera index and RNG at iteration *i* to be a pure
function of (seed, i): resuming from a milestone then replays exactly the
same data order as the uninterrupted run.

``CameraSchedule`` reproduces the epoch-permutation semantics: epoch
``e = step // n`` uses the e-th permutation of a seeded generator, consumed
back-to-front (the reference pops from the shuffled list). Regeneration on
resume walks the generator forward from scratch — permutations are cheap
(n is the camera count) so this is O(steps/n) negligible work.
"""

from __future__ import annotations

import jax
import numpy as np


class CameraSchedule:
    """step -> camera index; pure in (seed, n_cameras, step)."""

    def __init__(self, seed: int, n_cameras: int):
        self.seed = int(seed)
        self.n = max(int(n_cameras), 1)
        self._rng = np.random.default_rng(seed)
        self._epoch = -1
        self._perm: np.ndarray | None = None

    def index(self, step: int) -> int:
        epoch, pos = divmod(int(step), self.n)
        if epoch < self._epoch:
            # Replaying an earlier epoch: restart the generator.
            self._rng = np.random.default_rng(self.seed)
            self._epoch = -1
        while self._epoch < epoch:
            self._perm = self._rng.permutation(self.n)
            self._epoch += 1
        # Reference consumes via list.pop() = back-to-front.
        return int(self._perm[self.n - 1 - pos])


def iteration_key(seed: int, iteration: int) -> jax.Array:
    """Per-iteration PRNG key, pure in (seed, iteration) — resume-exact."""
    return jax.random.fold_in(jax.random.PRNGKey(seed), iteration)
