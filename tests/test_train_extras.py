"""Flow-matching training phase, color reset, and affine baking."""

import dataclasses
import os

import numpy as np
import jax.numpy as jnp
import pytest

from eogs2_tpu.config import eogsplus, baseogs
from eogs2_tpu.data.synthetic import generate_scene
from eogs2_tpu.rasterizer import RasterizeConfig
from eogs2_tpu.scene import load_scene
from eogs2_tpu.train import Trainer

RCFG = RasterizeConfig(tile_capacity=256, tile_chunk=8, max_tiles_per_gaussian=16)


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("scene"))
    generate_scene(d, n_views=3, width=32, height=32, hf_res=64, n_buildings=2,
                   scale=8.0, seed=5)
    return d


def test_flowmatch_phase_runs(scene_dir):
    scene = load_scene(scene_dir, images_msi_path=os.path.join(scene_dir, "images"),
                       eval_split=True, load_pan=False)
    cfg = baseogs(scene_dir, iterations=30)
    o = cfg.optimization
    o.flowmatching.apply_flowmatching = True
    o.iterstart_flowmatching = 10
    o.iterstart_shadowmapping = 5
    o.iterstart_L_new_resample = 5
    cfg.logging.tb_log_interval = 10
    tr = Trainer(cfg=cfg, scene=scene, raster_cfg=RCFG).setup()
    tr.train(progress=False)
    assert np.isfinite(tr.metrics_history[-1]["loss"])
    # the flow-matched phase actually compiled (phase has the flag on)
    assert any(p.enable_flowmatch for p in tr._steps)


def test_apply_flowmatching_to_affine(scene_dir):
    scene = load_scene(scene_dir, images_msi_path=os.path.join(scene_dir, "images"),
                       eval_split=True, load_pan=False)
    cfg = baseogs(scene_dir, iterations=20)
    cfg.logging.tb_log_interval = 10
    tr = Trainer(cfg=cfg, scene=scene, raster_cfg=RCFG).setup()
    tr.train(progress=False)
    before = np.asarray(tr.consts.affines).copy()
    tr.apply_flowmatching_to_affine()
    after = np.asarray(tr.consts.affines)
    # only the intercepts (u, v rows) may change
    np.testing.assert_array_equal(before[:, :, :3], after[:, :, :3])
    np.testing.assert_array_equal(before[:, 2, 3], after[:, 2, 3])
    assert np.all(np.abs(after[:, :2, 3] - before[:, :2, 3]) < 0.5)
    # training continues after the step-cache rebuild
    tr.train(max_iterations=5, progress=False)


def test_color_reset_runs(scene_dir):
    scene = load_scene(scene_dir, images_msi_path=os.path.join(scene_dir, "images"),
                       eval_split=True, load_pan=False)
    cfg = baseogs(scene_dir, iterations=15)
    cfg.logging.tb_log_interval = 5
    tr = Trainer(cfg=cfg, scene=scene, raster_cfg=RCFG).setup()
    tr.train(progress=False)
    tr.color_reset()
    assert np.isfinite(np.asarray(tr.state.params.opacity)).all()


def test_dual_modality_training(tmp_path):
    """MS mode: msi + pan cameras per view in one step (mode 'fixed')."""
    from eogs2_tpu.data.synthetic import generate_scene as gen

    d = str(tmp_path / "ms_scene")
    gen(d, n_views=3, width=32, height=32, hf_res=64, n_buildings=2,
        scale=8.0, seed=7, modality="ms")
    scene = load_scene(
        d,
        images_msi_path=os.path.join(d, "images"),
        images_pan_path=os.path.join(d, "images_pan"),
        eval_split=True, load_pan=True, load_msi=True,
    )
    types = {v.image_type for v in scene.train_views}
    assert types == {"msi", "pan"}
    cfg = baseogs(d, iterations=12)
    cfg.model.load_pan = True
    cfg.model.load_msi = True
    cfg.model.msi_to_pan_name = "fixed"
    cfg.logging.tb_log_interval = 6
    tr = Trainer(cfg=cfg, scene=scene, raster_cfg=RCFG).setup()
    assert len(tr.modal_views) == 2
    tr.train(progress=False)
    m = tr.metrics_history[-1]
    assert np.isfinite(m["loss"])
    assert "msi_photometric" in m and "pan_photometric" in m


def test_cc_train_to_test_and_normalize(scene_dir):
    scene = load_scene(scene_dir, images_msi_path=os.path.join(scene_dir, "images"),
                       eval_split=True, load_pan=False)
    cfg = baseogs(scene_dir, iterations=10)
    cfg.optimization.normalize_colors_before_saving = True
    cfg.logging.tb_log_interval = 5
    tr = Trainer(cfg=cfg, scene=scene, raster_cfg=RCFG).setup()
    tr.train(progress=False)
    test_sh = tr.test_shading_params()
    assert test_sh.cc_weight.shape[0] == 1
    # averaged cc equals the mean of the train cams'
    np.testing.assert_allclose(
        np.asarray(test_sh.cc_weight[0]),
        np.asarray(tr.state.shading.cc_weight).mean(0), atol=1e-6,
    )


def test_video_rendering(scene_dir, tmp_path):
    from eogs2_tpu.model import GaussianModel
    from eogs2_tpu.video import render_video

    scene = load_scene(scene_dir, images_msi_path=os.path.join(scene_dir, "images"),
                       eval_split=True, load_pan=False)
    cfg = baseogs(scene_dir, iterations=5)
    tr = Trainer(cfg=cfg, scene=scene, raster_cfg=RCFG).setup()
    tr.train(progress=False)
    model = GaussianModel(params=tr.state.params, aux=tr.state.aux)
    out = render_video(model, scene.train_views[0].camera, RCFG,
                       str(tmp_path / "orbit.mp4"), n_frames=4, fps=2)
    assert os.path.exists(out)


def test_views_per_step_batching(scene_dir):
    scene = load_scene(scene_dir, images_msi_path=os.path.join(scene_dir, "images"),
                       eval_split=True, load_pan=False)
    cfg = baseogs(scene_dir, iterations=12)
    cfg.optimization.views_per_step = 2
    cfg.logging.tb_log_interval = 6
    tr = Trainer(cfg=cfg, scene=scene, raster_cfg=RCFG).setup()
    tr.train(progress=False)
    m = tr.metrics_history[-1]
    assert np.isfinite(m["loss"]) and m["photometric"] < 1.0


def test_capacity_auto_rebucket(scene_dir):
    """Undersized tile capacity grows automatically during training."""
    from eogs2_tpu.rasterizer import RasterizeConfig

    scene = load_scene(scene_dir, images_msi_path=os.path.join(scene_dir, "images"),
                       eval_split=True, load_pan=False)
    cfg = baseogs(scene_dir, iterations=60)
    cfg.logging.tb_log_interval = 10
    small = RasterizeConfig(tile_capacity=128, tile_chunk=8,
                            max_tiles_per_gaussian=4)
    tr = Trainer(cfg=cfg, scene=scene, raster_cfg=small).setup()
    tr.train(progress=False)
    assert np.isfinite(tr.metrics_history[-1]["loss"])
    # the dense 32x32 scene overflows K=128 and/or 4 tiles/gaussian
    assert (tr.raster_cfg.tile_capacity > 128
            or tr.raster_cfg.max_tiles_per_gaussian > 4)


def test_opacity_auto_calibration(scene_dir):
    scene = load_scene(scene_dir, images_msi_path=os.path.join(scene_dir, "images"),
                       eval_split=True, load_pan=False)
    cfg = baseogs(scene_dir, iterations=5)
    tr = Trainer(cfg=cfg, scene=scene, raster_cfg=RCFG).setup()
    v = tr.calibrate_opacity_init(target_acc=0.99, iters=8)
    assert 1e-4 < v < 0.9
    # the calibrated state renders with mean acc-opacity near the target
    from eogs2_tpu.model import GaussianModel
    from eogs2_tpu.pipeline import render_view_full

    m = GaussianModel(params=tr.state.params, aux=tr.state.aux)
    out = render_view_full(m, scene.train_views[0].camera, RCFG, with_sun=False)
    assert abs(float(np.mean(out["acc_opacity"])) - 0.99) < 0.05


def test_steps_per_dispatch_chunking(scene_dir):
    """The lax.scan chunked loop must run the same number of iterations,
    respect event boundaries (densify cadence / phase edges), and reach a
    comparable loss to the per-iteration loop."""
    scene = load_scene(scene_dir, images_msi_path=os.path.join(scene_dir, "images"),
                       eval_split=True, load_pan=False)

    def run(spd):
        cfg = baseogs(scene_dir, iterations=40)
        cfg.seed = 7
        cfg.logging.tb_log_interval = 20
        cfg.optimization.iterstart_shadowmapping = 15
        cfg.optimization.iterstart_L_new_resample = 15
        cfg.optimization.densification.densify_from_iter = 5
        cfg.optimization.densification.densification_interval = 10
        tr = Trainer(cfg=cfg, scene=scene, raster_cfg=RCFG,
                     steps_per_dispatch=spd).setup()
        tr.train(progress=False)
        return tr

    tr1 = run(1)
    trc = run(16)
    assert int(trc.state.step) == int(tr1.state.step) == 40
    l1 = tr1.metrics_history[-1]["loss"]
    lc = trc.metrics_history[-1]["loss"]
    assert np.isfinite(lc)
    # same recipe, different RNG stream: losses agree loosely
    assert abs(lc - l1) / max(abs(l1), 1e-6) < 0.5
    # both phases were compiled (phase edge at iter 15 was respected)
    assert any(p.enable_sun for p in trc._steps)


def test_capacity_shrinks_after_transient(tmp_path):
    """Auto-rebucketing must come back DOWN once occupancy stays low
    (4 consecutive 50-iter checks): start with oversized buckets and train
    250+ iterations on the tiny scene."""
    import os

    from eogs2_tpu.config import baseogs
    from eogs2_tpu.data.synthetic import generate_scene
    from eogs2_tpu.rasterizer import RasterizeConfig
    from eogs2_tpu.scene import load_scene
    from eogs2_tpu.train import Trainer

    d = str(tmp_path / "scene")
    generate_scene(d, n_views=3, width=48, height=48, hf_res=64,
                   n_buildings=2, scale=8.0, seed=2)
    scene = load_scene(d, images_msi_path=os.path.join(d, "images"),
                       eval_split=True, load_pan=False)
    cfg = baseogs(d, iterations=260)
    cfg.optimization.iterstart_shadowmapping = 10_000  # keep it cheap
    cfg.optimization.iterstart_L_new_resample = 10_000
    cfg.optimization.densify_until_iter = 0
    rcfg = RasterizeConfig(pair_capacity=1 << 16, tile_capacity=512,
                           tile_chunk=16, max_tiles_per_gaussian=64)
    tr = Trainer(cfg=cfg, scene=scene, raster_cfg=rcfg).setup()
    tr.train(progress=False)
    assert tr.raster_cfg.max_tiles_per_gaussian < 64 or \
        tr.raster_cfg.tile_capacity < 512, (
            tr.raster_cfg.max_tiles_per_gaussian, tr.raster_cfg.tile_capacity)


def test_msi_to_pan_fixedandtranslate():
    """fixedandtranslate == fixed at zero residual; grads flow only through
    the residual conv (transf_msi_to_pan.py:134-178)."""
    import jax

    from eogs2_tpu.shading import msi_to_pan

    img = jnp.asarray(np.random.RandomState(0).rand(3, 8, 8), jnp.float32)
    w0 = jnp.zeros(3)
    b0 = jnp.zeros(())
    out = msi_to_pan(img, "fixedandtranslate", w0, b0)
    ref = msi_to_pan(img, "fixed")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    # the fixed path is stop-gradient: d(out)/d(img) comes only from residual
    g = jax.grad(lambda im, w: jnp.sum(msi_to_pan(im, "fixedandtranslate", w, b0)))(img, w0)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)
    gw = jax.grad(
        lambda w: jnp.sum(msi_to_pan(img, "fixedandtranslate", w, b0))
    )(w0)
    assert np.all(np.asarray(gw) > 0)


def test_pansharp_loss():
    from eogs2_tpu.losses import pansharp_loss
    from eogs2_tpu.pansharpen import load_pansharp

    rng = np.random.RandomState(3)
    gt_pan = jnp.asarray(rng.rand(1, 16, 16), jnp.float32)
    gt_msi = jnp.asarray(rng.rand(3, 8, 8), jnp.float32)
    sharp = load_pansharp("brovey")(img_pan=gt_pan, img_msi=gt_msi)
    assert float(pansharp_loss(sharp, gt_pan, gt_msi)) < 1e-12
    l = float(pansharp_loss(jnp.zeros_like(sharp), gt_pan, gt_msi))
    assert np.isfinite(l) and l > 0


def test_ply_scene_init(scene_dir):
    from eogs2_tpu.io.ply import write_point_cloud

    xyz = np.random.RandomState(1).uniform(-0.5, 0.5, (123, 3)).astype(np.float32)
    rgb = np.random.RandomState(2).rand(123, 3).astype(np.float32)
    write_point_cloud(os.path.join(scene_dir, "custom_init.ply"), xyz, rgb)
    scene = load_scene(scene_dir, images_msi_path=os.path.join(scene_dir, "images"),
                       eval_split=True, load_pan=False,
                       input_ply_name="custom_init")
    assert scene.init_xyz.shape == (123, 3)
    np.testing.assert_allclose(scene.init_xyz, xyz, atol=1e-6)


def test_lpips_torch_declared_fallback():
    """lpips_torch exists; without torchvision/weights it raises and
    compute_metrics falls back to the weight-free proxy."""
    from eogs2_tpu import metrics_cli

    a = np.random.RandomState(0).rand(3, 32, 32).astype(np.float32)
    try:
        v = metrics_cli.lpips_torch(a, a)
        assert v < 1e-6  # identical inputs
    except Exception:
        pass  # torchvision absent in this image: fallback path
    assert np.isfinite(metrics_cli.perceptual_distance(a, 1.0 - a))


def test_early_exit_auto_pick(scene_dir):
    """early_exit_auto starts the fused chunk early-exit OFF (translucent
    fresh scene) and flips it ON once observed saturation is high
    (sat_frac metric; DESIGN.md section 8c)."""
    from eogs2_tpu.rasterizer import RasterizeConfig
    from eogs2_tpu.train import Trainer

    scene = load_scene(scene_dir, images_msi_path=os.path.join(scene_dir, "images"),
                       eval_split=True, load_pan=False)
    cfg = baseogs(scene_dir, iterations=110)
    cfg.logging.tb_log_interval = 50
    # near-opaque init -> renders saturate immediately; freeze opacity so
    # the opacity regularizer can't de-saturate the scene mid-test
    cfg.model.opacity_init_value = 0.99
    cfg.optimization.opacity_lr = 0.0
    rcfg = RasterizeConfig(pair_capacity=1 << 13, tile_capacity=128,
                           tile_chunk=8, binning_mode="fused",
                           early_exit=True)
    tr = Trainer(cfg=cfg, scene=scene, raster_cfg=rcfg).setup()
    # auto mode overrides the initial True with False
    assert tr.raster_cfg.early_exit is False
    tr.train(progress=False)
    assert any(m.get("sat_frac", 0.0) > 0.55 for m in tr.metrics_history)
    # two consecutive 50-iteration checks saw saturation -> flipped ON
    assert tr.raster_cfg.early_exit is True


def test_lpips_torch_structural_pin():
    """Pin lpips_torch's math WITHOUT pretrained weights (VERDICT r2 item 8):
    inject a seeded random-weight net with the VGG16 `features` topology and
    check the result equals an independently-computed unit-normalized-
    activation L2 over the 5 relu blocks (lpipsPyTorch/modules/lpips.py
    structure)."""
    import pytest

    torch = pytest.importorskip("torch")
    import torch.nn as nn

    from eogs2_tpu import metrics_cli

    torch.manual_seed(0)

    def block(cin, cout, n_conv):
        layers = []
        for i in range(n_conv):
            layers += [nn.Conv2d(cin if i == 0 else cout, cout, 3, padding=1),
                       nn.ReLU()]
        layers.append(nn.MaxPool2d(2))
        return layers

    # same layer INDICES as torchvision vgg16().features (31 modules),
    # smaller widths (the slice math is width-independent)
    layers = (block(3, 8, 2) + block(8, 8, 2) + block(8, 8, 3)
              + block(8, 8, 3) + block(8, 8, 3))
    assert len(layers) == 31
    net = nn.Sequential(*layers).eval()

    rng = np.random.RandomState(1)
    a = rng.rand(3, 64, 64).astype(np.float32)
    b = rng.rand(3, 64, 64).astype(np.float32)

    d_ab = metrics_cli.lpips_torch(a, b, net=net)
    # identical inputs -> exactly zero distance
    assert metrics_cli.lpips_torch(a, a, net=net) < 1e-12
    # symmetry of the squared-difference form
    assert abs(metrics_cli.lpips_torch(b, a, net=net) - d_ab) < 1e-9

    # independent re-computation of the documented formula
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def unit_feats(x):
        x = (torch.as_tensor(x)[None] - mean) / std
        out = []
        with torch.no_grad():
            for i, layer in enumerate(net):
                x = layer(x)
                if i in (3, 8, 15, 22, 29):  # relu1_2..relu5_3
                    out.append(x / (x.norm(dim=1, keepdim=True) + 1e-10))
        return out

    expect = float(
        sum(((fa - fb) ** 2).sum(1).mean()
            for fa, fb in zip(unit_feats(a), unit_feats(b)))
    ) / 5.0
    assert abs(d_ab - expect) < 1e-6, (d_ab, expect)


def test_lpips_calibrated_path_pin(tmp_path):
    """VERDICT r3 item 7: the CALIBRATED lpips path (learned per-channel
    linear heads) must apply lin_l(diff^2) -> spatial mean -> SUM over
    blocks, exactly the reference chain (lpipsPyTorch/modules/lpips.py);
    pinned with injected weights against an independent recomputation,
    and load_lpips_weights round-trips both supported formats."""
    import pytest

    torch = pytest.importorskip("torch")
    import torch.nn as nn

    from eogs2_tpu import metrics_cli

    torch.manual_seed(0)

    def block(cin, cout, n_conv):
        layers = []
        for i in range(n_conv):
            layers += [nn.Conv2d(cin if i == 0 else cout, cout, 3, padding=1),
                       nn.ReLU()]
        layers.append(nn.MaxPool2d(2))
        return layers

    layers = (block(3, 8, 2) + block(8, 8, 2) + block(8, 8, 3)
              + block(8, 8, 3) + block(8, 8, 3))
    net = nn.Sequential(*layers).eval()

    rng = np.random.RandomState(2)
    a = rng.rand(3, 64, 64).astype(np.float32)
    b = rng.rand(3, 64, 64).astype(np.float32)
    lins = [rng.rand(8).astype(np.float32) for _ in range(5)]

    got = metrics_cli.lpips_torch(a, b, net=net, lin_weights=lins)

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def unit_feats(x):
        x = (torch.as_tensor(x)[None] - mean) / std
        out = []
        with torch.no_grad():
            for i, layer in enumerate(net):
                x = layer(x)
                if i in (3, 8, 15, 22, 29):
                    out.append(x / (x.norm(dim=1, keepdim=True) + 1e-10))
        return out

    # independent: numpy weighted channel sum, spatial mean, SUM of blocks
    expect = 0.0
    for w, fa, fb in zip(lins, unit_feats(a), unit_feats(b)):
        d = (fa - fb).numpy() ** 2  # [1, C, H, W]
        expect += float(
            (w.reshape(1, -1, 1, 1) * d).sum(1).mean()
        )
    assert abs(got - expect) < 1e-6, (got, expect)

    # loader round-trip: npz format
    npz = str(tmp_path / "lpips.npz")
    np.savez(npz, **{
        f"lin{i}": np.concatenate(
            [lins[i]] * (metrics_cli._VGG_WIDTHS[i] // 8)
        ) for i in range(5)
    })
    loaded = metrics_cli.load_lpips_weights(npz)
    assert [x.shape[0] for x in loaded] == list(metrics_cli._VGG_WIDTHS)
    # loader round-trip: official vgg.pth torch state-dict format
    pth = str(tmp_path / "vgg.pth")
    torch.save(
        {f"lin{i}.model.1.weight":
         torch.as_tensor(loaded[i]).view(1, -1, 1, 1) for i in range(5)},
        pth,
    )
    loaded2 = metrics_cli.load_lpips_weights(pth)
    for x, y in zip(loaded, loaded2):
        np.testing.assert_array_equal(x, y)


def test_big_testing_and_save_iterations(scene_dir, tmp_path):
    """big_testing_iterations drives the full train/test report and
    save_iterations drives mid-run model saves (train_pan.py:598-660)."""
    from eogs2_tpu.observability import MetricsLogger

    scene = load_scene(scene_dir, images_msi_path=os.path.join(scene_dir, "images"),
                       eval_split=True, load_pan=False)
    cfg = baseogs(scene_dir, iterations=6)
    cfg.logging.model_path = str(tmp_path / "run")
    cfg.logging.big_testing_iterations = [4]
    cfg.save_iterations = (4,)
    tr = Trainer(cfg=cfg, scene=scene, raster_cfg=RCFG).setup()
    tr.report_logger = MetricsLogger(cfg.logging.model_path,
                                     use_tensorboard=False)
    tr.train(progress=False)
    # mid-run save happened at iteration 4
    assert os.path.exists(os.path.join(
        cfg.logging.model_path, "point_cloud", "iteration_4", "point_cloud.ply"))
    assert os.path.exists(os.path.join(
        cfg.logging.model_path, "camera_params", "iteration_4"))
    assert os.path.exists(os.path.join(
        cfg.logging.model_path, "optimizer", "iteration_4"))
    # report logged scalars + images
    import json as _json

    rows = [_json.loads(l) for l in open(
        os.path.join(cfg.logging.model_path, "metrics.jsonl"))]
    report_rows = [r for r in rows if any(k.startswith("train/") for k in r)]
    assert report_rows and report_rows[0]["step"] == 4
    assert any(k.startswith("train/psnr") for k in report_rows[0])
    img_dir = os.path.join(cfg.logging.model_path, "images")
    assert os.path.isdir(img_dir) and len(os.listdir(img_dir)) > 0


def test_frozen_caps_overflow_is_loud(scene_dir, capsys):
    """VERDICT r3 item 5: with auto_rebucket=False, a capacity overflow
    must surface a nonzero clipped_pairs metric AND a printed warning —
    never a silent clip."""
    from eogs2_tpu.rasterizer import RasterizeConfig

    scene = load_scene(scene_dir, images_msi_path=os.path.join(scene_dir, "images"),
                       eval_split=True, load_pan=False)
    cfg = baseogs(scene_dir, iterations=60)
    cfg.logging.tb_log_interval = 10
    # deliberately undersized tiles/gaussian on the dense 32x32 scene
    tiny = RasterizeConfig(tile_capacity=128, tile_chunk=8,
                           max_tiles_per_gaussian=4, binning_mode="fused")
    tr = Trainer(cfg=cfg, scene=scene, raster_cfg=tiny,
                 auto_rebucket=False).setup()
    tr.train(progress=False)
    # caps stayed frozen
    assert tr.raster_cfg.max_tiles_per_gaussian == 4
    assert tr.raster_cfg.tile_capacity == 128
    clipped = [float(np.max(np.asarray(m["clipped_pairs"])))
               for m in tr.metrics_history]
    assert max(clipped) > 0, "scene must actually overflow the tiny caps"
    out = capsys.readouterr().out
    assert "WARNING: rasterizer clipped" in out


def test_two_tier_trainer_end_to_end(scene_dir):
    """Training with the two-tier emission (big_k>0) runs and reaches a
    finite loss with zero clipped pairs at adequate capacities."""
    from eogs2_tpu.rasterizer import RasterizeConfig

    scene = load_scene(scene_dir, images_msi_path=os.path.join(scene_dir, "images"),
                       eval_split=True, load_pan=False)
    cfg = baseogs(scene_dir, iterations=60)
    cfg.logging.tb_log_interval = 10
    rcfg = RasterizeConfig(tile_capacity=256, tile_chunk=8,
                           max_tiles_per_gaussian=8, binning_mode="fused",
                           big_k=16, big_tcap=64)
    tr = Trainer(cfg=cfg, scene=scene, raster_cfg=rcfg).setup()
    tr.train(progress=False)
    m = tr.metrics_history[-1]
    assert np.isfinite(m["loss"])
    # the big tier absorbed the wide splats: bulk tier never grew past 8
    # (auto_rebucket would have grown it if the bulk max exceeded it)
    assert tr.raster_cfg.big_k == 16


def test_prewarm_bucket_ladder(scene_dir):
    """prewarm_bucket_ladder AOT-compiles the next capacity bucket without
    touching the live config, and a subsequent grow to that bucket reuses
    the compiled step (same Phase key machinery)."""
    scene = load_scene(scene_dir, images_msi_path=os.path.join(scene_dir, "images"),
                       eval_split=True, load_pan=False)
    cfg = baseogs(scene_dir, iterations=8)
    cfg.logging.tb_log_interval = 4
    tr = Trainer(cfg=cfg, scene=scene, raster_cfg=RCFG).setup()
    rc0 = tr.raster_cfg
    tr.prewarm_bucket_ladder(iteration=1, steps_up=1)
    # live config and compiled-step table untouched
    assert tr.raster_cfg == rc0
    tr.train(progress=False)
    assert np.isfinite(tr.metrics_history[-1]["loss"])


def test_probe_capacities(scene_dir):
    """probe_capacities sizes caps from the init state's preprocess so a
    frozen-caps run starts with zero clipped pairs (the round-4 lesson:
    guessed caps clipped 2.8M pairs at iter 50 at reference scale)."""
    from eogs2_tpu.rasterizer import RasterizeConfig

    scene = load_scene(scene_dir, images_msi_path=os.path.join(scene_dir, "images"),
                       eval_split=True, load_pan=False)
    cfg = baseogs(scene_dir, iterations=20)
    cfg.logging.tb_log_interval = 10
    tiny = RasterizeConfig(tile_capacity=128, tile_chunk=8,
                           max_tiles_per_gaussian=4, binning_mode="fused")
    tr = Trainer(cfg=cfg, scene=scene, raster_cfg=tiny,
                 auto_rebucket=False).setup()
    rc = tr.probe_capacities(big_k=8)
    assert rc.max_tiles_per_gaussian >= 4
    assert rc.big_k == 8
    tr.train(progress=False)
    clipped = [float(np.max(np.asarray(m["clipped_pairs"])))
               for m in tr.metrics_history]
    assert max(clipped) == 0, clipped


def test_probe_capacities_joint_search(scene_dir):
    """Default big_k=0 searches the (tcap, big_k, big_tcap) space for the
    min-row table (round-5 lesson: a FIXED big_k=4096 at a dense
    reference-scale init forced bulk tcap=64 and an 86M-row table out of
    HBM). Zero clipping must hold, and the searched table must be no
    larger than the one a pinned big tier would have picked."""
    from eogs2_tpu.rasterizer import RasterizeConfig

    scene = load_scene(scene_dir, images_msi_path=os.path.join(scene_dir, "images"),
                       eval_split=True, load_pan=False)
    cfg = baseogs(scene_dir, iterations=20)
    cfg.logging.tb_log_interval = 10
    tiny = RasterizeConfig(tile_capacity=128, tile_chunk=8,
                           max_tiles_per_gaussian=4, binning_mode="fused")
    tr = Trainer(cfg=cfg, scene=scene, raster_cfg=tiny,
                 auto_rebucket=False).setup()
    n = tr.state.params.xyz.shape[0]
    rc = tr.probe_capacities()
    rows = n * rc.max_tiles_per_gaussian + rc.big_k * rc.big_tcap
    rc_pin = tr.probe_capacities(big_k=8)
    rows_pin = n * rc_pin.max_tiles_per_gaussian + rc_pin.big_k * rc_pin.big_tcap
    assert rows <= rows_pin, (rows, rows_pin)
    tr.probe_capacities()  # restore the searched config
    tr.train(progress=False)
    clipped = [float(np.max(np.asarray(m["clipped_pairs"])))
               for m in tr.metrics_history]
    assert max(clipped) == 0, clipped


def test_probe_capacities_tile_cull(scene_dir):
    """With tile_cull on, the probe sizes tcap from ACTIVE (post-cull)
    tiles and sets rect_cap over the AABB; training stays clip-free and
    the active-based table is never larger than the rect-based one."""
    from eogs2_tpu.rasterizer import RasterizeConfig

    scene = load_scene(scene_dir, images_msi_path=os.path.join(scene_dir, "images"),
                       eval_split=True, load_pan=False)
    cfg = baseogs(scene_dir, iterations=20)
    cfg.logging.tb_log_interval = 10
    tiny = RasterizeConfig(tile_capacity=128, tile_chunk=8,
                           max_tiles_per_gaussian=4, binning_mode="fused",
                           tile_cull=True)
    tr = Trainer(cfg=cfg, scene=scene, raster_cfg=tiny,
                 auto_rebucket=False).setup()
    n = tr.state.params.xyz.shape[0]
    rc = tr.probe_capacities()
    assert rc.tile_cull
    rows_cull = n * rc.max_tiles_per_gaussian + rc.big_k * rc.big_tcap
    tr2 = Trainer(cfg=cfg, scene=scene,
                  raster_cfg=dataclasses.replace(tiny, tile_cull=False),
                  auto_rebucket=False).setup()
    rc2 = tr2.probe_capacities()
    rows_rect = n * rc2.max_tiles_per_gaussian + rc2.big_k * rc2.big_tcap
    assert rows_cull <= rows_rect, (rows_cull, rows_rect)
    tr.train(progress=False)
    clipped = [float(np.max(np.asarray(m["clipped_pairs"])))
               for m in tr.metrics_history]
    assert max(clipped) == 0, clipped
    assert np.isfinite(tr.metrics_history[-1]["loss"])


def test_prewarm_bucket_ladder_cache_reuse(scene_dir, tmp_path):
    """VERDICT r3 item 5 / r4 next #8: prewarming the bucket ladder makes
    a later rebucket grow a persistent-cache HIT. Proven via the cache
    directory itself: after prewarm, compiling the grown-config step adds
    ZERO new cache entries. next_buckets() is the shared contract between
    the prewarmer and the rebucket grow rules."""
    import jax

    cache = str(tmp_path / "jc")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        from eogs2_tpu.rasterizer import RasterizeConfig

        scene = load_scene(scene_dir,
                           images_msi_path=os.path.join(scene_dir, "images"),
                           eval_split=True, load_pan=False)
        cfg = baseogs(scene_dir, iterations=8)
        cfg.logging.tb_log_interval = 4
        # deliberately unusual capacities: if ANY other test compiled the
        # same step HLO first, the in-process executable cache serves it
        # and no persistent-cache file is written (the suite-order flake
        # this test had in round 5)
        rcfg = RasterizeConfig(tile_capacity=120, tile_chunk=8, k_chunk=24,
                               max_tiles_per_gaussian=8,
                               binning_mode="fused", big_k=8, big_tcap=16)
        tr = Trainer(cfg=cfg, scene=scene, raster_cfg=rcfg,
                     auto_rebucket=False).setup()
        # the prewarmed configs must be exactly what a grow produces
        grown = tr.next_buckets()[2]  # big_tcap growth (the common event)
        assert grown.big_tcap == 32
        tr.prewarm_bucket_ladder()
        before = set(os.listdir(cache))
        assert before, "prewarm wrote no cache entries"
        # simulate the rebucket grow: rebuild + compile EXACTLY the grown
        # step (a fresh jit object, so the in-process jit cache can't
        # serve it — the persistent cache is the only dedup layer; a MISS
        # would write a new cache file). train() is deliberately NOT used
        # here: its aux programs (eval, maintenance) write cache entries
        # whose presence depends on what ran earlier in the session.
        import jax.numpy as jnp
        from eogs2_tpu.train import make_gates, phase_for_iteration

        tr.raster_cfg = grown
        tr._steps = {}
        phase = phase_for_iteration(tr.cfg, 1)
        step = tr._get_step(phase)
        absargs = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                jnp.asarray(x).shape, jnp.asarray(x).dtype
            ),
            (tr.state, jnp.int32(0), jax.random.PRNGKey(0),
             make_gates(tr.cfg, 1, tr.init_count)),
        )
        step.lower(*absargs).compile()
        after = set(os.listdir(cache))
        new = after - before
        assert not new, (
            f"grown-step compile missed the prewarmed cache: {new}"
        )
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
