"""CLI end-to-end smoke (in-process, CPU): make-synthetic -> train ->
render -> tsdf -> eval-dsm through the argparse surface."""

import json
import os

import numpy as np
import pytest

from eogs2_tpu import cli


def run_cli(argv):
    return cli.main(argv)


@pytest.mark.parametrize("seed", [0])
def test_cli_full_chain(tmp_path, capsys, seed):
    d = str(tmp_path / "scene")
    out = str(tmp_path / "run")
    assert run_cli(["make-synthetic", "--out", d, "--n-views", "4",
                    "--width", "48", "--height", "48", "--hf-res", "96",
                    "--n-buildings", "2", "--scale", "10",
                    "--seed", str(seed)]) == 0
    assert run_cli([
        "train", "--scene-dir", d, "--preset", "baseogs", "--iterations", "40",
        "--model-path", out, "--tile-capacity", "256", "--tile-chunk", "8",
        "--checkpoint-every", "20",
    ]) == 0
    assert os.path.exists(os.path.join(out, "point_cloud", "iteration_40",
                                       "point_cloud.ply"))
    assert os.path.exists(os.path.join(out, "chkpnt20"))
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))

    assert run_cli(["render", "--scene-dir", d, "--model-path", out,
                    "--tile-capacity", "256", "--tile-chunk", "8"]) == 0
    dsm = os.path.join(out, "test_opNone", "ours_40", "dsm", "Nadir.tif")
    assert os.path.exists(dsm)
    train_base = os.path.join(out, "train_opNone", "ours_40")
    # every reference-active artifact kind must exist and be non-empty for
    # train views (render_pan.py:311-399 artifact lists)
    for kind in ("altitude", "acc_opacity", "final", "raw_render", "cc",
                 "gt", "nadir_pov", "nadirpovsampled", "nadiraltitudesampled",
                 "nadir_altitude_diff", "flowmatched_altitude",
                 "flow_matched_image", "gt_flowmatch"):
        assert os.listdir(os.path.join(train_base, kind)), kind
    assert os.path.exists(os.path.join(out, "test_opNone", "ours_40", "png",
                                       "Nadir_dsm.png"))

    assert run_cli(["tsdf", "--scene-dir", d, "--model-path", out,
                    "--vox-size", "0.5", "--tile-capacity", "256"]) == 0
    tsdf_dsm = os.path.join(out, "test_opNone", "ours_40", "tsdf", "dsm.tif")
    assert os.path.exists(tsdf_dsm)

    capsys.readouterr()
    assert run_cli(["eval-dsm", "--pred", dsm, "--gt-heightfield",
                    os.path.join(d, "gt_heightfield.npy"), "--scale", "10"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(res["mae"])


def test_cli_resume(tmp_path):
    d = str(tmp_path / "scene")
    out = str(tmp_path / "run")
    run_cli(["make-synthetic", "--out", d, "--n-views", "3", "--width", "32",
             "--height", "32", "--hf-res", "64", "--n-buildings", "2",
             "--scale", "8"])
    run_cli(["train", "--scene-dir", d, "--preset", "baseogs",
             "--iterations", "20", "--model-path", out,
             "--tile-capacity", "256", "--tile-chunk", "8",
             "--checkpoint-every", "20"])
    out2 = str(tmp_path / "run2")
    assert run_cli(["train", "--scene-dir", d, "--preset", "baseogs",
                    "--iterations", "10", "--model-path", out2,
                    "--tile-capacity", "256", "--tile-chunk", "8",
                    "--start-checkpoint", os.path.join(out, "chkpnt20")]) == 0
