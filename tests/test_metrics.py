import os

import numpy as np
import pytest

from desr_tpu import metrics as M


def test_identical_pred_zero_error():
    rng = np.random.default_rng(0)
    target = rng.uniform(0, 5100, (64, 64)).astype(np.float64)
    target[:5, :5] = 0
    hole = target < M.HOLES_THRESHOLD
    K = np.array([[577.0, 0, 32], [0, 577, 32], [0, 0, 1]])
    out = M.calc_metrics(target, target, hole, hole, K, 5100,
                         ["rmse", "mae", "mae_d", "rmse_d", "mse_v", "ssim"])
    assert out["rmse"] == 0 and out["mae"] == 0
    assert out["mae_d"] == 0 and out["rmse_d"] == 0
    assert out["mse_v"] == pytest.approx(0, abs=1e-12)
    assert out["ssim"] == pytest.approx(1.0, abs=1e-6)


def test_hole_region_metrics():
    target = np.full((32, 32), 1000.0)
    pred = target.copy()
    pred[:8, :8] = 0.0  # pred holes
    hole_map = pred < M.HOLES_THRESHOLD
    thm = np.zeros_like(hole_map)
    K = np.eye(3)
    out = M.calc_metrics(pred, target, hole_map, thm, K, 5100,
                         ["mae_h", "rmse_h", "mae_d", "rmse_d"])
    assert out["mae_h"] == pytest.approx(1000.0)
    assert out["rmse_h"] == pytest.approx(1000.0)
    assert out["mae_d"] == 0.0


def test_mae_h_nan_when_no_pred_holes():
    target = np.full((16, 16), 1000.0)
    hole = np.zeros((16, 16), bool)
    out = M.calc_metrics(target, target, hole, hole, np.eye(3), 5100, ["mae_h", "rmse_h"])
    assert np.isnan(out["mae_h"]) and np.isnan(out["rmse_h"])


def test_end_to_end_cli(tmp_path):
    import imageio

    rng = np.random.default_rng(1)
    for d in ["input", "pred", "target"]:
        os.makedirs(tmp_path / d, exist_ok=True)
    intr = tmp_path / "intr"
    for i in range(3):
        stem = f"scene{i:04d}_00_{i}"
        target = rng.uniform(100, 5000, (60, 80)).astype(np.uint16)
        pred = np.clip(target.astype(np.int64) + rng.integers(-50, 50, target.shape), 0, 65535).astype(np.uint16)
        inp = target.copy()
        inp[:10, :10] = 0
        imageio.imwrite(tmp_path / "input" / f"{stem}.png", inp)
        imageio.imwrite(tmp_path / "pred" / f"{stem}.png", pred)
        imageio.imwrite(tmp_path / "target" / f"{stem}.png", target)
        d = intr / stem[:12] / "intrinsic"
        os.makedirs(d, exist_ok=True)
        np.savetxt(d / "intrinsic_depth.txt",
                   np.array([[577.0, 0, 40, 0], [0, 577, 30, 0], [0, 0, 1, 0], [0, 0, 0, 1]]))
    out = M.main([
        "--input_path", str(tmp_path / "input"), "--pred_path", str(tmp_path / "pred"),
        "--target_path", str(tmp_path / "target"), "--n_cpus", "1",
        "--intr_root", str(intr),
    ])
    for name in M.DEFAULT_METRICS:
        assert name in out
        assert np.isfinite(out[name]) or np.isnan(out[name])
    assert out["rmse"] < 60


def test_sr_downsample_rule(tmp_path):
    import imageio

    rng = np.random.default_rng(2)
    target = rng.uniform(100, 5000, (64, 64)).astype(np.uint16)
    pred = target[0::2, 0::2]  # exactly the SR rule: pred at half res
    for d in ["input", "pred", "target"]:
        os.makedirs(tmp_path / d, exist_ok=True)
    imageio.imwrite(tmp_path / "input" / "x.png", target)
    imageio.imwrite(tmp_path / "pred" / "x.png", pred)
    imageio.imwrite(tmp_path / "target" / "x.png", target)
    out = M.calculate_given_paths(
        [str(tmp_path / "input" / "x.png")], [str(tmp_path / "pred" / "x.png")],
        [str(tmp_path / "target" / "x.png")],
        ["rmse", "mae"], 5100, 1)
    assert out["rmse"] == 0.0 and out["mae"] == 0.0
