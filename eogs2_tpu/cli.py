"""Command-line orchestration.

Parity target: the reference's entry points —
  train_pan.py (train), render_pan.py (render artifacts),
  eval/eval_dsm.py (DSM MAE), tsdf.py (TSDF fusion),
  full_eval_pan.py (all four in sequence) — driven by preset x scene flags
  instead of Hydra YAML composition:

  python -m eogs2_tpu.cli train --scene-dir <dir> --preset eogsplus ...
  python -m eogs2_tpu.cli render --scene-dir <dir> --model-path <out>
  python -m eogs2_tpu.cli eval-dsm --pred <dsm.tif> --gt-dir <dir> --aoi JAX_068
  python -m eogs2_tpu.cli tsdf --model-path <out> --scene-dir <dir>
  python -m eogs2_tpu.cli full-eval --scene-dir <dir> --preset eogsplus
  python -m eogs2_tpu.cli make-synthetic --out <dir>
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _setup_jax(cache=True):
    import time

    import jax

    if cache:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # fail fast with a clear message when the TPU tunnel is mid-recycle (the
    # claim can only happen at interpreter start; retry at the process level,
    # e.g. via tpurun.sh)
    try:
        jax.devices()
    except RuntimeError as e:
        print(
            f"jax backend unavailable: {e}\n"
            "If this is the transient TPU-tunnel recycle window, re-run the "
            "command (see tpurun.sh).",
            file=sys.stderr,
        )
        raise SystemExit(75)  # EX_TEMPFAIL
    return jax


def _load(args, load_pan=None, load_msi=None):
    from eogs2_tpu.scene import load_scene

    images_msi = args.images_msi or os.path.join(args.scene_dir, "images")
    images_pan = args.images_pan or os.path.join(args.scene_dir, "images")
    return load_scene(
        args.scene_dir,
        images_msi_path=images_msi,
        images_pan_path=images_pan,
        eval_split=True,
        need_rescale=args.need_rescale,
        target_density=args.target_density,
        load_msi=load_msi if load_msi is not None else True,
        load_pan=load_pan if load_pan is not None else False,
        seed=args.seed,
        input_ply_name=getattr(args, "input_ply_name", None),
    )


def cmd_train(args):
    # multi-host bootstrap must happen before ANY jax computation
    from eogs2_tpu.parallel.distributed import init_distributed

    args._distributed = init_distributed(
        getattr(args, "coordinator", None),
        getattr(args, "num_processes", None),
        getattr(args, "process_id", None),
    )
    _setup_jax()
    from eogs2_tpu.config import PRESETS
    from eogs2_tpu.rasterizer import RasterizeConfig
    from eogs2_tpu.train import Trainer
    from eogs2_tpu.model import GaussianModel

    cfg = PRESETS[args.preset](args.scene_dir)
    if args.iterations:
        cfg.optimization.iterations = args.iterations
        cfg.optimization.densify_until_iter = args.iterations
    cfg.logging.model_path = args.model_path
    cfg.seed = args.seed
    if args.checkpoint_every:
        cfg.checkpoint_iterations = tuple(
            range(args.checkpoint_every, cfg.optimization.iterations + 1,
                  args.checkpoint_every)
        )
    scene = _load(args, load_pan=cfg.model.load_pan, load_msi=cfg.model.load_msi)
    rcfg = RasterizeConfig(
        pair_capacity=1 << args.log2_pair_capacity,
        tile_capacity=args.tile_capacity,
        tile_chunk=args.tile_chunk,
        binning_mode={"safe": "gather", "fast": "sorted",
                      "fused": "fused"}[args.raster_mode],
        use_pallas=args.raster_mode == "fast",
    )
    if args.opacity_init and args.opacity_init != "auto":
        cfg.model.opacity_init_value = float(args.opacity_init)
    if args.views_per_step:
        cfg.optimization.views_per_step = args.views_per_step
    mesh = None
    n_devices = args.n_devices
    if getattr(args, "_distributed", False):
        # multi-host: jax.devices() is now the GLOBAL device list; default
        # to the whole pod unless --n-devices narrows it explicitly
        import jax

        if n_devices <= 1:
            n_devices = len(jax.devices())
    if n_devices > 1:
        # multi-chip training: shard the Gaussian state over a "g" mesh axis
        # (on CPU use XLA_FLAGS=--xla_force_host_platform_device_count=N to
        # validate without hardware)
        from eogs2_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_devices, axes=("g",))
        print(f"training on mesh {dict(mesh.shape)} ({n_devices} devices)")
    tr = Trainer(cfg=cfg, scene=scene, raster_cfg=rcfg, mesh=mesh,
                 raster_backend=args.raster_backend,
                 steps_per_dispatch=args.steps_per_dispatch).setup()
    if args.opacity_init == "auto":
        tr.calibrate_opacity_init()
    if args.start_checkpoint:
        it0 = tr.restore(args.start_checkpoint)
        print(f"restored checkpoint at iteration {it0}")

    from eogs2_tpu.observability import MetricsLogger

    if getattr(args, "_distributed", False):
        # every process runs the same SPMD loop; only process 0 owns the
        # run dir (others log to a scratch subdir to avoid write races)
        import jax

        if jax.process_index() != 0:
            args.model_path = os.path.join(
                args.model_path, f"proc{jax.process_index()}"
            )
    logger = MetricsLogger(args.model_path)
    logger.save_config({"preset": args.preset, "scene_dir": args.scene_dir,
                        "model": cfg.model, "optimization": cfg.optimization})

    def log_hook(trainer, m, iteration):
        logger.log_scalars(m, iteration)
        if iteration % (50 * cfg.logging.tb_log_interval) == 0:
            print(
                f"[{iteration:6d}] loss={m['loss']:.4f} "
                f"photo={m['photometric']:.4f} psnr={m['psnr']:.2f} "
                f"alive={m['alive']}",
                flush=True,
            )

    tr.log_hook = log_hook
    tr.report_logger = logger  # big_testing_iterations report target
    if args.save_iterations:
        tr.cfg.save_iterations = tuple(
            int(x) for x in args.save_iterations.split(",") if x
        )
    if args.big_testing_iterations:
        tr.cfg.logging.big_testing_iterations = [
            int(x) for x in args.big_testing_iterations.split(",") if x
        ]

    mae_hook = None
    if args.eval_during_training and os.path.exists(
        os.path.join(args.scene_dir, "gt_heightfield.npy")
    ):
        from eogs2_tpu.eval.mae import MaeComputer
        from eogs2_tpu.pipeline import evaluate_dsm_mae

        mc = MaeComputer.from_synthetic(args.scene_dir, scale=scene.scene_scale)
        tr.mae_computer = mc  # RDSM figure in training_report

        def mae_hook(trainer, state, iteration):
            model = GaussianModel(params=state.params, aux=state.aux)
            mae, _, _, _ = evaluate_dsm_mae(model, scene, mc, rcfg)
            print(f"[{iteration}] DSM MAE {mae:.3f} m", flush=True)

        tr.eval_hook = mae_hook

    state = tr.train()

    it = tr.save_model()
    with open(os.path.join(args.model_path, "cfg_args.json"), "w") as f:
        json.dump({"preset": args.preset, "scene_dir": args.scene_dir,
                   "iterations": it}, f)
    with open(os.path.join(args.model_path, "metrics.json"), "w") as f:
        json.dump(tr.metrics_history, f)
    print(f"saved model to {args.model_path} at iteration {it}")
    return 0


def cmd_render(args):
    _setup_jax()
    from eogs2_tpu.render_artifacts import render_sets

    return render_sets(args)


def cmd_video(args):
    """Orbit fly-around video from a saved model (render_video.py parity)."""
    _setup_jax()
    from eogs2_tpu.rasterizer import RasterizeConfig
    from eogs2_tpu.render_artifacts import load_model, load_shading
    from eogs2_tpu.video import render_video

    model, it = load_model(args.model_path, args.iteration)
    shading = load_shading(args.model_path, it)
    scene = _load(args)
    base_view = next(
        (v for v in scene.train_views if not v.is_virtual), scene.train_views[0]
    )
    rcfg = RasterizeConfig(
        pair_capacity=1 << args.log2_pair_capacity,
        tile_capacity=args.tile_capacity,
        tile_chunk=args.tile_chunk,
    )
    out_path = args.out or os.path.join(args.model_path, "video", "orbit.mp4")
    written = render_video(
        model, base_view.camera, rcfg, out_path,
        n_frames=args.n_frames, fps=args.fps, max_shear=args.max_shear,
        shading=shading,
    )
    print(f"video written to {written}")
    return 0


def cmd_eval_dsm(args):
    from eogs2_tpu.eval.mae import MaeComputer

    if args.gt_heightfield:
        mc = MaeComputer.from_synthetic(
            os.path.dirname(args.gt_heightfield), scale=args.scale
        )
    else:
        mc = MaeComputer.from_gt_dir(args.gt_dir, args.aoi_id,
                                     filter_tree=args.filter_tree)
    mae, diff, rdsm = mc.compute_mae_from_path(args.pred)
    print(json.dumps({"mae": mae, "aoi": args.aoi_id}))
    if args.out_dir:
        from eogs2_tpu.io.geotiff import write_geotiff

        os.makedirs(args.out_dir, exist_ok=True)
        write_geotiff(os.path.join(args.out_dir, "rdsm_diff.tif"),
                      diff.astype(np.float32))
        write_geotiff(os.path.join(args.out_dir, "rdsm.tif"),
                      rdsm.astype(np.float32))
    return 0


def cmd_tsdf(args):
    _setup_jax()
    from eogs2_tpu.eval.tsdf import run_tsdf_cli

    return run_tsdf_cli(args)


def cmd_full_eval(args):
    """full_eval_pan.py parity: train -> render -> eval_dsm -> tsdf in one
    process (full_eval_pan.py:23-31)."""
    rc = cmd_train(args)
    if rc:
        return rc
    args.iteration = -1
    rc = cmd_render(args)
    if rc:
        return rc
    pc_root = os.path.join(args.model_path, "point_cloud")
    it = max(int(d.split("_")[-1]) for d in os.listdir(pc_root))
    pred = os.path.join(args.model_path, "test_opNone", f"ours_{it}", "dsm",
                        "Nadir.tif")
    gt_hf = os.path.join(args.scene_dir, "gt_heightfield.npy")
    if os.path.exists(gt_hf) and os.path.exists(pred):
        from eogs2_tpu.eval.mae import MaeComputer
        from eogs2_tpu.scene import load_scene as _ls

        sc = _ls(args.scene_dir, images_msi_path=None, eval_split=True,
                 target_density=0.001)
        mc = MaeComputer.from_synthetic(args.scene_dir, scale=sc.scene_scale)
        mae, _, _ = mc.compute_mae_from_path(pred)
        print(json.dumps({"stage": "eval_dsm", "mae": mae}))
    args.vox_size = getattr(args, "vox_size", 0.5)
    args.trunc_margin_fact = getattr(args, "trunc_margin_fact", 4.0)
    rc = cmd_tsdf(args)
    tsdf_pred = os.path.join(args.model_path, "test_opNone", f"ours_{it}",
                             "tsdf", "dsm.tif")
    if os.path.exists(gt_hf) and os.path.exists(tsdf_pred):
        mae, _, _ = mc.compute_mae_from_path(tsdf_pred)
        print(json.dumps({"stage": "eval_dsm_tsdf", "mae": mae}))
    return rc


def cmd_make_synthetic(args):
    from eogs2_tpu.data.synthetic import generate_scene

    generate_scene(
        args.out,
        n_views=args.n_views,
        width=args.width,
        height=args.height,
        hf_res=args.hf_res,
        n_buildings=args.n_buildings,
        seed=args.seed,
        scale=args.scale,
    )
    print(f"synthetic scene written to {args.out}")
    return 0


def build_parser():
    p = argparse.ArgumentParser(prog="eogs2_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--scene-dir", required=False, default="")
        sp.add_argument("--images-msi", default=None)
        sp.add_argument("--images-pan", default=None)
        sp.add_argument("--model-path", default="output/run")
        sp.add_argument("--preset", default="baseogs")
        sp.add_argument("--iterations", type=int, default=0)
        sp.add_argument("--seed", type=int, default=1337)
        sp.add_argument("--need-rescale", action="store_true")
        sp.add_argument("--target-density", type=float, default=0.13)
        sp.add_argument("--input-ply-name", default=None,
                        help="init gaussians from <scene>/<name>.ply instead "
                             "of the uniform cloud (dataset_MS_affine.py:116-121)")
        sp.add_argument("--log2-pair-capacity", type=int, default=20)
        sp.add_argument("--tile-capacity", type=int, default=1024)
        sp.add_argument("--tile-chunk", type=int, default=64)
        sp.add_argument("--eval-during-training", action="store_true")
        sp.add_argument("--iteration", type=int, default=-1)
        sp.add_argument("--start-checkpoint", default="")
        sp.add_argument("--checkpoint-every", type=int, default=0)
        sp.add_argument("--n-devices", type=int, default=1)
        sp.add_argument("--raster-backend", default="gspmd",
                        choices=["gspmd", "a2a"],
                        help="multi-chip render path: GSPMD-partitioned "
                        "single-chip step, or the explicit all_to_all "
                        "pair-exchange rasterizer (needs --n-devices>1). "
                        "a2a shards the image over the mesh, so it is "
                        "mutually exclusive with --views-per-step>1 "
                        "(DP over views); pick one scaling axis")
        # multi-host bootstrap (jax.distributed): pass all three on every
        # process, or set EOGS2_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID
        sp.add_argument("--coordinator", default=None,
                        help="host:port of process 0 (enables multi-host)")
        sp.add_argument("--num-processes", type=int, default=None)
        sp.add_argument("--process-id", type=int, default=None)
        sp.add_argument("--steps-per-dispatch", type=int, default=1)
        sp.add_argument("--views-per-step", type=int, default=0,
                        help="batch N cameras per optimizer step (vmapped "
                             "renders, summed grads); 0 = preset default")
        sp.add_argument(
            "--raster-mode", default="safe",
            choices=["safe", "fast", "fused"],
            help="fast = sort-carried binning + Pallas blend kernels (TPU); "
                 "fused = ragged sort-carried blend, no dense pair table",
        )
        sp.add_argument(
            "--opacity-init", default="",
            help="'auto' calibrates so mean acc-opacity ~0.999 at iter 1 "
                 "(the reference's empirical table, automated), or a float",
        )
        sp.add_argument("--random-pov", action="store_true",
                        help="also write random-camera resample artifacts "
                             "(render_pan.py:241-272)")
        sp.add_argument("--random-pov-extent", type=float, default=0.2)
        sp.add_argument("--save-iterations", default="",
                        help="comma list of mid-run model-save iterations")
        sp.add_argument("--big-testing-iterations", default="",
                        help="comma list of full train/test report iterations")

    for name, fn in [
        ("train", cmd_train),
        ("render", cmd_render),
        ("full-eval", cmd_full_eval),
        ("video", cmd_video),
    ]:
        sp = sub.add_parser(name)
        common(sp)
        if name == "video":
            sp.add_argument("--out", default="",
                            help="output mp4 path (default "
                                 "<model-path>/video/orbit.mp4)")
            sp.add_argument("--n-frames", type=int, default=60)
            sp.add_argument("--fps", type=int, default=15)
            sp.add_argument("--max-shear", type=float, default=0.25)
        sp.set_defaults(fn=fn)

    sp = sub.add_parser("eval-dsm")
    sp.add_argument("--pred", required=True)
    sp.add_argument("--gt-dir", default="")
    sp.add_argument("--aoi-id", default="")
    sp.add_argument("--gt-heightfield", default="")
    sp.add_argument("--scale", type=float, default=25.0)
    sp.add_argument("--filter-tree", action="store_true")
    sp.add_argument("--out-dir", default="")
    sp.set_defaults(fn=cmd_eval_dsm)

    sp = sub.add_parser("tsdf")
    common(sp)
    sp.add_argument("--vox-size", type=float, default=0.5)
    sp.add_argument("--trunc-margin-fact", type=float, default=4.0)
    sp.add_argument("--export-mesh", action="store_true")
    # --n-devices (from common()) shards TSDF integration over voxel slabs
    sp.set_defaults(fn=cmd_tsdf)

    sp = sub.add_parser("make-synthetic")
    sp.add_argument("--out", required=True)
    sp.add_argument("--n-views", type=int, default=9)
    sp.add_argument("--width", type=int, default=128)
    sp.add_argument("--height", type=int, default=128)
    sp.add_argument("--hf-res", type=int, default=256)
    sp.add_argument("--n-buildings", type=int, default=6)
    sp.add_argument("--scale", type=float, default=25.0)
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=cmd_make_synthetic)
    return p


def main(argv=None):
    global jax
    import jax  # noqa

    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
