"""Capacity auto-grow for the static-shape rasterizer (the re-jit protocol).

The CUDA rasterizer sizes its duplication/binning buffers dynamically at
every call (resizable byte buffers, rasterizer_impl.cu:155-194). XLA needs
static shapes, so the TPU path renders with fixed capacities and returns
overflow counters; this module closes the loop the binning docstrings
promise: when a counter is nonzero, grow the corresponding capacity and
re-specialize (re-jit) the render.

Three independent capacities, each with its own counter and growth rule:

- ``tile_cap``   — per-Gaussian tile-rect slots in the dense expansion.
    Counter: ``bin_overflow`` minus the capacity part. Grow to cover
    ``max_tiles_touched`` exactly (rounded up to the next power of two).
- ``dup_capacity`` — total duplication slots carried through the sort and
    the dup gather. Counter: ``cap_overflow``. Grow to ``num_rendered``
    plus slack, rounded to the kernel chunk size.
- ``k_max``      — per-tile compositing depth. Counter: ``tile_overflow``.
    Grow to ``max_tile_count`` rounded to the chunk size.

``render_adaptive`` loops until all counters are zero, so one call always
produces the EXACT uncapped image (tested against an uncapped render in
tests/test_adaptive.py). Trainers instead use a ``CapState`` with a
one-step-lagged check (``CapState.observe``) to avoid a device sync in the
hot loop: an overflowing step renders a slightly degraded frame (exactly
what the counters quantify), and the NEXT step re-jits with grown caps.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

# Keep in sync with pallas_composite.C_CHUNK without importing Pallas here
# (this module must stay importable on CPU-only installs).
_CHUNK = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _next_pow2(x: int) -> int:
    return 1 << max(0, int(x - 1).bit_length())


@dataclasses.dataclass
class RasterCaps:
    """Static rasterizer capacities (one jit specialization per value set)."""

    tile_cap: int = 8
    dup_capacity: int | None = None  # None = n * tile_cap (lossless)
    k_max: int = 4096
    # Fused-binning bucket sizing (raster/fused.py): every Gaussian owns
    # cap_a rect slots; Gaussians with bigger rects get one of big_cap
    # wide rows. None = render_fused's n-derived default.
    cap_a: int = 4
    big_cap: int | None = None

    def grown(self, ovf: dict[str, int]) -> "RasterCaps":
        """Return caps covering the observed overflow diagnostics.

        ``ovf`` holds ints for (bin_overflow, big_overflow, cap_overflow,
        tile_overflow, max_tiles_touched, max_tile_count, num_rendered,
        num_big).
        """
        tile_cap = self.tile_cap
        big = ovf.get("big_overflow", 0)
        # bin_overflow folds all three truncations; the per-gaussian rect
        # part is what max_tiles_touched sizes.
        rect = ovf.get("bin_overflow", 0) - ovf.get("cap_overflow", 0) - big
        big_cap = self.big_cap
        if rect > 0:
            # Round to 16, not pow2: the fused expansion costs
            # (tile_cap - cap_a) * big_cap slots, so a pow2 overshoot of a
            # single large splat (e.g. 144 -> 256 tiles) can inflate the
            # bucket-B expansion by tens of millions of slots.
            tile_cap = _round_up(max(ovf["max_tiles_touched"], tile_cap + 1), 16)
            if big_cap is None and "num_big" in ovf:
                # Pin bucket-B rows to the observed big-Gaussian count
                # (x2 slack) instead of render_fused's n-derived default —
                # a wide tile_cap with an n/8 big_cap is exactly the
                # slot-explosion case above.
                big_cap = _next_pow2(max(2 * ovf["num_big"], 1024))
        if big > 0:
            # Grow the bucket-B row count toward the observed number of
            # Gaussians whose rect exceeds cap_a (ADVICE r4: big_cap must
            # participate in auto-grow, not masquerade as tile_cap).
            base = big_cap if big_cap is not None else 0
            big_cap = _next_pow2(max(ovf.get("num_big", base * 2 + 1), base + 1))
        dup_capacity = self.dup_capacity
        if ovf.get("cap_overflow", 0) > 0:
            need = int(ovf["num_rendered"] * 1.25)
            base = dup_capacity if dup_capacity is not None else need
            dup_capacity = _round_up(max(need, base + 1), _CHUNK)
        k_max = self.k_max
        if ovf.get("tile_overflow", 0) > 0:
            k_max = _round_up(max(ovf["max_tile_count"], k_max + 1), _CHUNK)
        return RasterCaps(
            tile_cap=tile_cap, dup_capacity=dup_capacity, k_max=k_max,
            cap_a=self.cap_a, big_cap=big_cap,
        )


_OVF_KEYS = (
    "bin_overflow",
    "big_overflow",
    "cap_overflow",
    "tile_overflow",
    "max_tiles_touched",
    "max_tile_count",
    "num_rendered",
    "num_big",
)


def read_overflow(out: dict[str, Any]) -> dict[str, int]:
    """Fetch the overflow diagnostics of a render output to host ints."""
    vals = [out.get(k) for k in _OVF_KEYS]
    fetched = jax.device_get([v for v in vals if v is not None])
    it = iter(fetched)
    return {k: int(next(it)) for k, v in zip(_OVF_KEYS, vals) if v is not None}


def overflowed(ovf: dict[str, int]) -> bool:
    return (
        ovf.get("bin_overflow", 0) > 0
        or ovf.get("cap_overflow", 0) > 0
        or ovf.get("tile_overflow", 0) > 0
    )


def render_adaptive(
    render_fn: Callable[..., dict],
    caps: RasterCaps,
    *args,
    max_grows: int = 8,
    log_fn: Callable[[dict], None] | None = None,
    **kwargs,
) -> tuple[dict, RasterCaps]:
    """Call ``render_fn(*args, tile_cap=, dup_capacity=, k_max=, **kwargs)``,
    growing ``caps`` and re-rendering until no counter overflows.

    Returns (output, final caps). The output is bit-identical to a render
    with unbounded capacities. ``render_fn`` is typically a functools.partial
    of api.rasterize_gaussians(mode='pallas'); each distinct caps value
    costs one jit specialization (cached by XLA across calls).
    """
    for _ in range(max_grows):
        out = render_fn(
            *args,
            tile_cap=caps.tile_cap,
            dup_capacity=caps.dup_capacity,
            k_max=caps.k_max,
            cap_a=caps.cap_a,
            big_cap=caps.big_cap,
            **kwargs,
        )
        ovf = read_overflow(out)
        if not overflowed(ovf):
            return out, caps
        new_caps = caps.grown(ovf)
        if log_fn:
            log_fn(dict(event="cap_grow", old=dataclasses.asdict(caps),
                        new=dataclasses.asdict(new_caps), overflow=ovf))
        caps = new_caps
    raise RuntimeError(f"capacity growth did not converge after {max_grows} tries: {ovf}")


class CapState:
    """Lag-checked capacity state for training loops.

    The trainer calls ``observe(aux)`` with the PREVIOUS step's aux dict
    (device arrays, already materialized — reading them does not stall the
    pipeline). When an overflow is seen, caps grow and ``version`` bumps;
    the trainer re-keys its jitted step cache on ``(caps.tile_cap,
    caps.dup_capacity, caps.k_max)``.
    """

    def __init__(self, caps: RasterCaps, log_fn=None):
        self.caps = caps
        self.version = 0
        self.log_fn = log_fn
        self.grow_events: list[dict] = []

    def key(self) -> tuple:
        return (self.caps.tile_cap, self.caps.dup_capacity, self.caps.k_max,
                self.caps.cap_a, self.caps.big_cap)

    def observe(self, aux: dict[str, Any]) -> bool:
        """Inspect a step's overflow counters; grow caps if needed.

        Returns True when caps changed (the caller must re-jit)."""
        ovf = read_overflow(aux)
        if not overflowed(ovf):
            return False
        new_caps = self.caps.grown(ovf)
        event = dict(
            event="cap_grow",
            old=dataclasses.asdict(self.caps),
            new=dataclasses.asdict(new_caps),
            overflow=ovf,
        )
        self.grow_events.append(event)
        if self.log_fn:
            self.log_fn(event)
        self.caps = new_caps
        self.version += 1
        return True
