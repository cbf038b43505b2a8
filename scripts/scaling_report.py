"""Multi-chip scaling accounting on the virtual CPU mesh.

Real multi-chip hardware is not available in this environment, so the
BASELINE "scaling efficiency 1 -> N" metric is stood in for by exact
compiled-graph accounting (VERDICT r3 weak #8): for each mesh size this
script compiles the tile-sharded train step (parallel/train.py — all
devices cooperating on ONE view: gaussian shards + image tile bands) and
the data+gauss sharded step, parses the optimized HLO for collective ops
(all-gather / all-reduce / all-to-all / collective-permute / reduce-
scatter), and reports per-step collective bytes alongside the analytic
ICI-bound efficiency model. Writes SCALING.md.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/scaling_report.py [--out SCALING.md]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

_DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "bf16": 2, "f16": 2,
                "s8": 1, "u8": 1, "s64": 8, "u64": 8, "f64": 8}
_COLLECTIVES = ("all-gather", "all-reduce", "all-to-all",
                "collective-permute", "reduce-scatter")


def _shape_bytes(shape_str: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    n = 1
    if dims:
        for d in dims.split(","):
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def collective_bytes(compiled_text: str) -> dict[str, int]:
    """Sum output bytes of every collective op in optimized HLO text."""
    out: dict[str, int] = {}
    for line in compiled_text.splitlines():
        s = line.strip()
        m = re.match(r"(?:ROOT )?%?[\w.\-]+ = ([^ ]+) (all-gather|all-reduce|"
                     r"all-to-all|collective-permute|reduce-scatter)", s)
        if not m:
            continue
        shape, op = m.group(1), m.group(2)
        total = 0
        if shape.startswith("("):
            for part in re.findall(r"\w+\[[\d,]*\]", shape):
                total += _shape_bytes(part)
        else:
            total += _shape_bytes(shape)
        out[op] = out.get(op, 0) + total
    return out


def build_tile_sharded(n_dev: int, capacity: int = 4096, width: int = 64):
    from sugar_tpu.core.cameras import make_camera
    from sugar_tpu.models import densifier as dens
    from sugar_tpu.models.gaussians import create_from_pcd
    from sugar_tpu.parallel.train import make_tile_sharded_train_step
    from sugar_tpu.trainers import optimizer as opt

    devices = jax.devices()[:n_dev]
    mesh = jax.sharding.Mesh(np.asarray(devices), ("shard",))
    h = 16 * max(n_dev, 1) * 2
    cam = make_camera(R=np.eye(3), T=np.zeros(3), fov_x=1.2, fov_y=1.2,
                      height=h, width=width)
    g = np.random.default_rng(0)
    pts = np.stack([g.uniform(-1, 1, 512), g.uniform(-1, 1, 512),
                    g.uniform(1.5, 4, 512)], -1).astype(np.float32)
    cols = g.uniform(0, 1, (512, 3)).astype(np.float32)
    model = create_from_pcd(pts, cols, capacity, sh_degree=1)
    adam = opt.init_adam(model.params)
    stats = dens.DensifyStats.zeros(capacity)
    lrs = opt.group_lrs(opt.OptimConfig(), spatial_lr_scale=1.0)
    step = make_tile_sharded_train_step(
        mesh, "shard", lrs, opt.OptimConfig(), active_sh_degree=1,
        tile_cap=8, k_max=512, use_kernel=False,
    )
    sh1 = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("shard"))
    params = jax.device_put(model.params, sh1)
    adam_s = dataclasses.replace(
        jax.device_put(dataclasses.replace(adam, count=None), sh1),
        count=adam.count,
    )
    stats_s = jax.device_put(stats, sh1)
    alive = jax.device_put(model.alive, sh1)
    gt = jnp.asarray(g.uniform(0, 1, (h, width, 3)).astype(np.float32))
    args = (params, alive, adam_s, stats_s, cam, gt,
            jnp.asarray(0, jnp.int32))
    lowered = step.lower(*args)
    return lowered.compile().as_text(), dict(
        h=h, w=width, capacity=capacity, n_dev=n_dev
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING.md")
    args = ap.parse_args()

    rows = []
    for n_dev in (1, 2, 4, 8):
        if n_dev > len(jax.devices()):
            break
        text, info = build_tile_sharded(n_dev)
        cb = collective_bytes(text)
        total = sum(cb.values())
        rays = info["h"] * info["w"]
        rows.append((n_dev, info, cb, total, rays))
        print(f"n_dev={n_dev}: collectives={cb} total={total}B", flush=True)

    lines = [
        "# SCALING — multi-chip collective accounting (virtual CPU mesh)",
        "",
        "Real multi-chip hardware is unavailable here; this table is exact",
        "compiled-graph accounting for the tile-sharded train step",
        "(`parallel/train.py: make_tile_sharded_train_step` — all devices",
        "cooperate on ONE view: Gaussian buffers sharded + image tile bands,",
        "`parallel/render.py`), compiled for N virtual devices and parsed",
        "from the optimized HLO. Scene: 4096-Gaussian capacity, 16N-row",
        "tile-band image (each device owns one band of tiles).",
        "",
        "| devices | image | collective bytes/step (by op) | total bytes/step |",
        "|---|---|---|---|",
    ]
    for n_dev, info, cb, total, rays in rows:
        by_op = ", ".join(f"{k}: {v:,}" for k, v in sorted(cb.items())) or "none"
        lines.append(
            f"| {n_dev} | {info['h']}x{info['w']} | {by_op} | {total:,} |"
        )
    lines += [
        "",
        "## ICI-bound efficiency model",
        "",
        "Per-step collective traffic at production scale is dominated by the",
        "all-gather of packed per-Gaussian render data ((6+CH) x N x 4 B x",
        "(D-1)/D per device) and the gradient reduce-scatter of the same",
        "size; the tile-band all-to-all moves only O(dup-capacity / D) route",
        "entries per device. With per-chip ICI bandwidth B_ici and per-step",
        "compute time T_c on one chip:",
        "",
        "    efficiency(D) ~= T_c / (T_c/D + bytes_collective(D) / B_ici)",
        "",
        "For the bench workload (N = 1M Gaussians, CH = 3, ~100 ms/step",
        "single-chip, v5e ICI ~ 1,600 Gbit/s aggregate per chip): the",
        "36 MB all-gather + 36 MB reduce-scatter cost ~0.4 ms/step — <1% of",
        "the step at D = 8, so weak scaling is compute-bound and near-linear",
        "until the per-device Gaussian shard no longer amortizes the fixed",
        "per-step sort cost (N/D ~ 100K).",
        "",
        "Numbers above regenerate with:",
        "`XLA_FLAGS=--xla_force_host_platform_device_count=8 python",
        "scripts/scaling_report.py`.",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
