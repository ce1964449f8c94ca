"""Smoke test for tools/quality_eval.py — the train->serve->score chain.

A 2-step run cannot learn; the test asserts the *chain* integrity (dataset
gen -> main.py train -> predict.py serve -> metrics score) and the scene
generator's contracts (learnable structure, holes present, all nine
new_metrics keys finite where defined)."""

import json
import os
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))


def test_scene_generator_contracts():
    import quality_eval as qe

    rng = np.random.default_rng(0)
    clean, rgb, noisy = qe.make_scene(rng, 64, 80)
    assert clean.dtype == np.uint16 and rgb.dtype == np.uint8
    assert clean.min() >= 600 and clean.max() <= 4800  # in-range mm
    holes = noisy == 0
    assert 0.005 < holes.mean() < 0.5  # holes present, not dominant
    # degraded tracks clean outside holes (sensor noise, not garbage)
    err = noisy[~holes].astype(np.float64) - clean[~holes]
    assert abs(err.mean()) < 20 and err.std() < 80
    # RGB carries geometric signal: shading correlates with depth gradient
    assert rgb.std() > 5


def test_quality_eval_chain(tmp_path, capsys):
    """--framework both: one run covers BOTH chains (ours via main.py/predict,
    the torch reference via its own train loop + albumentations shim), plus
    the shared-init .pth handoff between them."""
    import quality_eval as qe

    res = qe.main([
        "--root", str(tmp_path), "--epochs", "1", "--n_train", "4",
        "--n_test", "2", "--batch_size", "2", "--width", "8",
        "--hw", "128", "128", "--platform", "native",  # conftest already CPU
        "--framework", "both",
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["steps"] == res["steps"]  # printed ONE JSON line
    for split in ("baseline", "trained", "reference"):
        m = res[split]
        assert set(m) >= {"rmse", "mae", "rmse_h", "rmse_d", "psnr", "ssim",
                          "mae_h", "mae_d", "mse_v"}
        for k, v in m.items():
            assert np.isfinite(v), (split, k, v)
    # the degraded input's hole error must be large (the task exists)
    assert res["baseline"]["rmse_h"] > 500
    # both arms' predictions were actually written and scored
    assert len(os.listdir(os.path.join(str(tmp_path), "pred_qeval"))) == 2
    assert len(os.listdir(os.path.join(str(tmp_path), "pred_qeval_ref"))) == 2
    # head-to-head deltas are present and finite
    assert res["shared_init"] is True
    for k, v in res["ours_vs_reference_rel"].items():
        assert np.isfinite(v), (k, v)
    # both arms started from the SAME init checkpoints
    ours_init = os.path.join(str(tmp_path), "ckpt", "qeval", "init_net_Task.pth")
    ref_init = os.path.join(str(tmp_path), "ckpt", "qeval_ref", "init_net_Task.pth")
    assert os.path.exists(ours_init) and os.path.exists(ref_init)


def test_quality_eval_i2d_chain(tmp_path):
    """--stage i2d --framework both: dataset gen (fixed 480x640 geometry) ->
    I2D training in BOTH frameworks from one shared init (the torch
    reference arm drives I2D_model + my_I2D_dataset with the albumentations
    + ColorJitter shim) -> predict.py --I2D serving from RGB alone ->
    scoring, plus the constant train-mean-depth baseline row (the
    scale-free monocular floor)."""
    import quality_eval as qe

    res = qe.main([
        "--root", str(tmp_path), "--epochs", "1", "--n_train", "2",
        "--n_test", "2", "--batch_size", "2", "--width", "8",
        "--platform", "native",  # conftest already forces CPU
        "--stage", "i2d", "--framework", "both",
    ])
    assert res["stage"] == "i2d" and res["hw"] == [480, 640]
    for split in ("baseline", "baseline_mean", "trained", "reference"):
        m = res[split]
        assert set(m) >= {"rmse", "mae", "rmse_h", "rmse_d", "psnr", "ssim",
                          "mae_h", "mae_d", "mse_v"}
        for k, v in m.items():
            assert np.isfinite(v), (split, k, v)
    # the mean baseline has NO holes (constant > 0): its hole-metric rows
    # score the constant against the GT under the input's hole mask
    assert res["baseline_mean"]["rmse_h"] < res["baseline"]["rmse_h"]
    # predictions written at the scene geometry for every test frame
    for arm in ("pred_qeval", "pred_qeval_ref"):
        assert len(os.listdir(os.path.join(str(tmp_path), arm))) == 2
    # both arms started from the SAME init checkpoints
    assert os.path.exists(
        os.path.join(str(tmp_path), "ckpt", "qeval_ref", "init_net_Task.pth"))


def test_quality_eval_translation_chain(tmp_path):
    """--stage translation --framework both: trainA/trainB dataset gen ->
    stage-2 GAN training in BOTH frameworks from one shared init (the torch
    reference arm drives TranslationModel + translation_dataset) ->
    predict.py --translate BtoA serving -> per-pixel scoring of G_B
    (LQ->HQ) against the paired clean GT."""
    import quality_eval as qe

    res = qe.main([
        "--root", str(tmp_path), "--epochs", "1", "--n_train", "2",
        "--n_test", "2", "--batch_size", "2", "--width", "8",
        "--hw", "128", "128", "--crop_size", "64",
        "--platform", "native",  # conftest already forces CPU
        "--stage", "translation", "--framework", "both",
    ])
    assert res["stage"] == "translation" and res["hw"] == [128, 128]
    for split in ("baseline", "trained", "reference"):
        m = res[split]
        assert set(m) >= {"rmse", "mae", "rmse_h", "rmse_d", "psnr", "ssim",
                          "mae_h", "mae_d", "mse_v"}
        for k, v in m.items():
            assert np.isfinite(v), (split, k, v)
    for arm in ("pred_qeval", "pred_qeval_ref"):
        assert len(os.listdir(os.path.join(str(tmp_path), arm))) == 2
    assert os.path.exists(
        os.path.join(str(tmp_path), "ckpt", "qeval_ref", "init_net_G_B.pth"))


def test_quality_eval_sr_head_to_head_chain(tmp_path):
    """--stage sr --framework both: ONE shared main-stage pretrain, then both
    arms fine-tune the SR stage from the SAME handoff checkpoints (ours via
    main.py --SR, the reference via MainSRModel + my_naive_sr_dataset with
    the CPU init_net shim), both served through the AOT export chain and
    scored with the reference's [0::2] SR rule + bicubic baseline."""
    import quality_eval as qe

    res = qe.main([
        "--root", str(tmp_path), "--epochs", "1", "--n_train", "2",
        "--n_test", "1", "--batch_size", "2", "--width", "8",
        "--hw", "128", "128", "--platform", "native",
        "--stage", "sr", "--framework", "both",
    ])
    assert res["stage"] == "sr" and res["shared_init"] is True
    for split in ("baseline", "baseline_bicubic", "trained", "reference"):
        m = res[split]
        for k, v in m.items():
            assert np.isfinite(v), (split, k, v)
    for arm in ("pred_qeval", "pred_qeval_ref"):
        assert len(os.listdir(os.path.join(str(tmp_path), arm))) == 1
    # the handoff: the ref arm starts from the pretrain's latest checkpoints
    assert os.path.exists(
        os.path.join(str(tmp_path), "ckpt", "qeval_ref", "latest_net_Task.pth"))
