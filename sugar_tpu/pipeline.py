"""Full SuGaR pipeline driver: vanilla 3DGS -> coarse -> mesh -> refine ->
textured export.

The TPU equivalent of the reference's train.py (:114-192): runs the stages
in-process, passing artifacts through the filesystem exactly like the
reference (coarse checkpoint PLY, mesh PLY, refined PLY, textured OBJ), with
the same presets:

- ``low_poly``:  200k mesh vertices, 6 gaussians/triangle (train.py:92-99)
- ``high_poly``: 1M mesh vertices, 1 gaussian/triangle
- ``refinement_time``: 'short' 2k / 'medium' 7k / 'long' 15k iterations
  (train.py:100-108)

A vanilla 3DGS checkpoint (7k iterations) is a prerequisite, as in the
reference (README.md:94-95); :func:`run_vanilla` produces one.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from sugar_tpu.core.cameras import Camera
from sugar_tpu.io import datasets as ds
from sugar_tpu.io import ply as ply_io
from sugar_tpu.meshing.extract import ExtractConfig, extract_mesh_from_coarse_model
from sugar_tpu.models import gaussians as gm
from sugar_tpu.refine.trainer import RefineConfig, export_refined_ply, refined_training
from sugar_tpu.trainers.coarse import CoarseConfig, train_coarse
from sugar_tpu.trainers.vanilla import TrainConfig, train_vanilla_3dgs


@dataclasses.dataclass
class PipelineConfig:
    scene_path: str
    output_dir: str = "./output"
    regularization: str = "sdf"  # 'sdf', 'density' or 'dn_consistency' alias
    poly: str = "high_poly"  # 'high_poly' | 'low_poly'
    refinement_time: str = "long"  # 'short' | 'medium' | 'long'
    surface_level: float = 0.3
    eval_split: bool = True
    white_background: bool = False
    resolution_factor: int = 1
    vanilla_iterations: int = 7_000
    capacity: int = 2**19
    # Failure recovery (SURVEY.md §5): completed stages are skipped when
    # their artifact exists, and each stage saves/resumes mid-stage
    # milestones under <output_dir>/checkpoints/<stage>.
    resume: bool = True
    # Multi-chip execution (SURVEY.md §2.9): devices > 1 routes the
    # vanilla / coarse / meshing / refine stages through the sharded
    # parallel/ components over a ('data','gauss') jax.sharding.Mesh.
    # The reference has no distributed analog (train.py is single-GPU);
    # stage artifacts keep the same format either way.
    devices: int = 1
    mesh_gauss: int | None = None  # None = 2 if devices even else 1
    # Optional stage-config overrides (tests / experimentation).
    vanilla_overrides: dict = dataclasses.field(default_factory=dict)
    coarse_overrides: dict = dataclasses.field(default_factory=dict)
    extract_overrides: dict = dataclasses.field(default_factory=dict)
    refine_overrides: dict = dataclasses.field(default_factory=dict)

    @property
    def n_vertices_in_mesh(self) -> int:
        return 200_000 if self.poly == "low_poly" else 1_000_000

    @property
    def gaussians_per_triangle(self) -> int:
        return 6 if self.poly == "low_poly" else 1

    @property
    def refinement_iterations(self) -> int:
        return {"short": 2_000, "medium": 7_000, "long": 15_000}[self.refinement_time]


def pipeline_mesh(cfg: PipelineConfig):
    """The pipeline's device mesh, or None for single-device execution."""
    if cfg.devices <= 1:
        return None
    from sugar_tpu.parallel.mesh import make_mesh

    n_gauss = cfg.mesh_gauss
    if n_gauss is None:
        n_gauss = 2 if cfg.devices % 2 == 0 else 1
    import jax

    return make_mesh(
        n_data=cfg.devices // n_gauss, n_gauss=n_gauss,
        devices=jax.devices()[: cfg.devices],
    )


def load_scene(cfg: PipelineConfig) -> ds.SceneData:
    if os.path.exists(os.path.join(cfg.scene_path, "transforms_train.json")):
        return ds.load_blender_scene(
            cfg.scene_path,
            white_background=cfg.white_background,
            resolution_factor=cfg.resolution_factor,
        )
    return ds.load_colmap_scene(cfg.scene_path, resolution_factor=cfg.resolution_factor)


def _stage_ckpt_dir(cfg: PipelineConfig, stage: str) -> str:
    return os.path.join(cfg.output_dir, "checkpoints", stage)


def run_vanilla(
    cfg: PipelineConfig, scene: ds.SceneData, log_fn=print, network_gui=None
) -> str:
    """Stage 0: prerequisite vanilla 3DGS (gaussian_splatting/train.py)."""
    out_dir = os.path.join(
        cfg.output_dir, "vanilla_gs", f"iteration_{cfg.vanilla_iterations}"
    )
    ckpt = os.path.join(out_dir, "point_cloud.ply")
    if cfg.resume and os.path.exists(ckpt):
        log_fn(json.dumps({"event": "stage_skip", "stage": "vanilla", "artifact": ckpt}))
        return ckpt
    train_idx, _ = scene.split(cfg.eval_split)
    tkw = dict(
        iterations=cfg.vanilla_iterations,
        capacity=cfg.capacity,
        white_background=cfg.white_background,
    )
    tkw.update(cfg.vanilla_overrides)
    tcfg = TrainConfig(**tkw)
    mesh = pipeline_mesh(cfg)
    if mesh is not None:
        from sugar_tpu.parallel.trainer import train_vanilla_sharded

        model = train_vanilla_sharded(
            [scene.cameras[i] for i in train_idx],
            [scene.images[i] for i in train_idx],
            scene.points,
            scene.colors,
            extent=scene.extent,
            cfg=tcfg,
            n_data=mesh.shape["data"],
            n_gauss=mesh.shape["gauss"],
            log_fn=lambda d: log_fn(json.dumps(d)),
        )
    else:
        model = train_vanilla_3dgs(
            [scene.cameras[i] for i in train_idx],
            [scene.images[i] for i in train_idx],
            scene.points,
            scene.colors,
            extent=scene.extent,
            cfg=tcfg,
            log_fn=lambda d: log_fn(json.dumps(d)),
            checkpoint_dir=_stage_ckpt_dir(cfg, "vanilla"),
            resume=cfg.resume,
            network_gui=network_gui,
            source_path=cfg.scene_path,
        ).model
    os.makedirs(out_dir, exist_ok=True)
    gm.save_ply(model, ckpt)
    ds.save_cameras_json(
        os.path.join(cfg.output_dir, "vanilla_gs", "cameras.json"),
        scene.cameras,
        scene.image_names,
    )
    return ckpt


def run_coarse(cfg: PipelineConfig, scene: ds.SceneData, gs_ckpt: str, log_fn=print) -> str:
    """Stage 1: coarse surface alignment (train_coarse_{sdf,density})."""
    out = os.path.join(cfg.output_dir, "coarse", "coarse_15000.ply")
    if cfg.resume and os.path.exists(out):
        log_fn(json.dumps({"event": "stage_skip", "stage": "coarse", "artifact": out}))
        return out
    model = gm.load_ply(gs_ckpt)
    train_idx, _ = scene.split(cfg.eval_split)
    mode = "density" if cfg.regularization == "density" else "sdf"
    ckw = dict(mode=mode, white_background=cfg.white_background)
    ckw.update(cfg.coarse_overrides)
    ccfg = CoarseConfig(**ckw)
    mesh = pipeline_mesh(cfg)
    if mesh is not None:
        from sugar_tpu.parallel.coarse import train_coarse_sharded

        model = train_coarse_sharded(
            mesh,
            model,
            [scene.cameras[i] for i in train_idx],
            [scene.images[i] for i in train_idx],
            extent=scene.extent,
            cfg=ccfg,
            log_fn=lambda d: log_fn(json.dumps(d)),
        )
    else:
        model = train_coarse(
            model,
            [scene.cameras[i] for i in train_idx],
            [scene.images[i] for i in train_idx],
            extent=scene.extent,
            cfg=ccfg,
            log_fn=lambda d: log_fn(json.dumps(d)),
            checkpoint_dir=_stage_ckpt_dir(cfg, "coarse"),
            resume=cfg.resume,
        )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    gm.save_ply(model, out)
    return out


def run_extract_mesh(cfg: PipelineConfig, scene: ds.SceneData, coarse_ckpt: str, log_fn=print) -> str:
    """Stage 2: level-set sampling + Poisson + decimation (extract_mesh)."""
    out_probe = os.path.join(
        cfg.output_dir,
        "coarse_mesh",
        f"mesh_level{cfg.surface_level}_decim{cfg.n_vertices_in_mesh}.ply",
    )
    if cfg.resume and os.path.exists(out_probe):
        log_fn(json.dumps({"event": "stage_skip", "stage": "extract_mesh",
                           "artifact": out_probe}))
        return out_probe
    model = gm.load_ply(coarse_ckpt)
    train_idx, _ = scene.split(cfg.eval_split)
    ekw = dict(
        surface_level=cfg.surface_level,
        decimation_target=cfg.n_vertices_in_mesh,
    )
    ekw.update(cfg.extract_overrides)
    ecfg = ExtractConfig(**ekw)
    out = os.path.join(
        cfg.output_dir,
        "coarse_mesh",
        f"mesh_level{cfg.surface_level}_decim{cfg.n_vertices_in_mesh}.ply",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    mesh = pipeline_mesh(cfg)
    extract_mesh_from_coarse_model(
        model, [scene.cameras[i] for i in train_idx], ecfg, output_path=out,
        device_mesh=mesh,
    )
    return out


def run_refine(cfg: PipelineConfig, scene: ds.SceneData, mesh_path: str, log_fn=print) -> str:
    """Stage 3: joint mesh + surface-Gaussian refinement (train_refined)."""
    out = os.path.join(
        cfg.output_dir,
        "refined",
        f"refined_{cfg.gaussians_per_triangle}gpt_{cfg.refinement_iterations}.ply",
    )
    if cfg.resume and os.path.exists(out) and os.path.exists(
        out.replace(".ply", "_state.pkl")
    ):
        log_fn(json.dumps({"event": "stage_skip", "stage": "refine", "artifact": out}))
        return out
    verts, faces, colors = ply_io.load_mesh_ply(mesh_path)
    vc = colors.astype(np.float32) / 255.0 if colors is not None else None
    train_idx, _ = scene.split(cfg.eval_split)
    rkw = dict(
        num_iterations=cfg.refinement_iterations,
        n_gaussians_per_triangle=cfg.gaussians_per_triangle,
        white_background=cfg.white_background,
    )
    rkw.update(cfg.refine_overrides)
    rcfg = RefineConfig(**rkw)
    mesh = pipeline_mesh(cfg)
    if mesh is not None:
        from sugar_tpu.parallel.refine import refined_training_sharded

        params, bm = refined_training_sharded(
            mesh,
            verts,
            faces.astype(np.int64),
            vc,
            [scene.cameras[i] for i in train_idx],
            [scene.images[i] for i in train_idx],
            extent=scene.extent,
            cfg=rcfg,
            log_fn=lambda d: log_fn(json.dumps(d)),
        )
    else:
        params, bm = refined_training(
            verts,
            faces.astype(np.int64),
            vc,
            [scene.cameras[i] for i in train_idx],
            [scene.images[i] for i in train_idx],
            extent=scene.extent,
            cfg=rcfg,
            log_fn=lambda d: log_fn(json.dumps(d)),
            checkpoint_dir=_stage_ckpt_dir(cfg, "refine"),
            resume=cfg.resume,
        )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    export_refined_ply(params, bm, out)
    # Also persist the refined mesh + params for texture extraction.
    import pickle

    state_path = out.replace(".ply", "_state.pkl")
    with open(state_path, "wb") as f:
        pickle.dump(
            dict(
                vertices=np.asarray(params.vertices),
                faces=np.asarray(bm.faces),
                log_scales=np.asarray(params.log_scales),
                complex_rot=np.asarray(params.complex_rot),
                opacity_logit=np.asarray(params.opacity_logit),
                sh_dc=np.asarray(params.sh_dc),
                sh_rest=np.asarray(params.sh_rest),
                n_per_triangle=bm.n_per_triangle,
                thickness=float(bm.thickness),
            ),
            f,
        )
    return out


def run_texture(cfg: PipelineConfig, scene: ds.SceneData, refined_ply: str, log_fn=print) -> str:
    """Stage 4: UV texture baking + textured OBJ export
    (extract_refined_mesh_with_texture)."""
    out_probe = os.path.join(cfg.output_dir, "refined_mesh", "textured.obj")
    if cfg.resume and os.path.exists(out_probe):
        log_fn(json.dumps({"event": "stage_skip", "stage": "texture",
                           "artifact": out_probe}))
        return out_probe
    from sugar_tpu.refine.extract_textured import TextureConfig, extract_textured_mesh
    from sugar_tpu.refine.trainer import load_refined_state

    params, bm = load_refined_state(refined_ply.replace(".ply", "_state.pkl"))
    train_idx, _ = scene.split(cfg.eval_split)
    sh_degree = int(round(np.sqrt(params.sh_rest.shape[-1] + 1))) - 1
    out = os.path.join(cfg.output_dir, "refined_mesh", "textured.obj")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    extract_textured_mesh(
        params, bm, [scene.cameras[i] for i in train_idx], out,
        TextureConfig(), sh_degree=sh_degree,
    )
    return out


def load_reference_checkpoint(gs_output_path: str, iteration: int = 7000):
    """Load a checkpoint produced by the *reference* 3DGS/SuGaR training
    (output/<scene>/point_cloud/iteration_N/point_cloud.ply) so users can
    bring their existing models into the TPU stack unchanged."""
    ply = os.path.join(
        gs_output_path, "point_cloud", f"iteration_{iteration}", "point_cloud.ply"
    )
    if not os.path.exists(ply):
        raise FileNotFoundError(ply)
    return gm.load_ply(ply)


def run_full_pipeline(cfg: PipelineConfig, log_fn=print) -> dict:
    """All stages (reference train.py flow). Returns artifact paths."""
    scene = load_scene(cfg)
    gs = run_vanilla(cfg, scene, log_fn)
    coarse = run_coarse(cfg, scene, gs, log_fn)
    mesh = run_extract_mesh(cfg, scene, coarse, log_fn)
    refined = run_refine(cfg, scene, mesh, log_fn)
    textured = run_texture(cfg, scene, refined, log_fn)
    return dict(
        vanilla=gs, coarse=coarse, mesh=mesh, refined=refined, textured=textured
    )
