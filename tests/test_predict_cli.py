"""End-to-end serving CLI: predict.py over a fixture folder."""

import os
import sys

import numpy as np
import pytest


def test_predict_folder(tmp_path, monkeypatch):
    import imageio

    rng = np.random.default_rng(0)
    dd = tmp_path / "depth"
    di = tmp_path / "img"
    out = tmp_path / "out"
    os.makedirs(dd)
    os.makedirs(di)
    for i in range(3):
        # 100x140 frames -> auto-padded to 128x256 and cropped back
        imageio.imwrite(dd / f"f{i}.png", rng.integers(0, 6000, (100, 140)).astype(np.uint16))
        imageio.imwrite(di / f"f{i}.png", rng.integers(0, 255, (100, 140, 3)).astype(np.uint8))

    import predict

    predict.main([
        "--name", "pred_test", "--checkpoints_dir", str(tmp_path / "ckpt"),
        "--input_depth", str(dd), "--input_img", str(di), "--output", str(out),
        "--batch_size", "2", "--compute_dtype", "float32",
        "--net_args",
        "--ImageDepthf_outf", "8", "--ImageDepthf_basef", "8",
        "--Depthf_outf", "8", "--Depthf_basef", "8",
        "--I2D_base", "8", "--Task_basef", "8",
    ])
    files = sorted(os.listdir(out))
    assert files == ["f0.png", "f1.png", "f2.png"]
    pred = imageio.imread(out / "f0.png")
    assert pred.dtype == np.uint16
    assert pred.shape == (100, 140)  # padding cropped back off
    assert pred.max() <= 5100


def test_predict_sr_folder(tmp_path):
    """--SR serving: prediction on the INPUT grid, padding cropped back 1:1
    (regression: a 2x pad crop used to shrink padded SR outputs), crop flags
    auto-derived from the frame geometry when not passed."""
    import imageio

    rng = np.random.default_rng(0)
    dd = tmp_path / "depth"
    di = tmp_path / "img"
    out = tmp_path / "out"
    os.makedirs(dd)
    os.makedirs(di)
    for i in range(2):
        # 200x200 -> padded to 256x256 (the /128 grid), cropped back
        imageio.imwrite(dd / f"f{i}.png", rng.integers(0, 6000, (200, 200)).astype(np.uint16))
        imageio.imwrite(di / f"f{i}.png", rng.integers(0, 255, (200, 200, 3)).astype(np.uint8))

    import predict

    predict.main([
        "--name", "pred_sr_test", "--checkpoints_dir", str(tmp_path / "ckpt"),
        "--input_depth", str(dd), "--input_img", str(di), "--output", str(out),
        "--batch_size", "2", "--compute_dtype", "float32", "--SR",
        "--net_args",
        "--ImageDepthf_outf", "8", "--ImageDepthf_basef", "8",
        "--Depthf_outf", "8", "--Depthf_basef", "8",
        "--I2D_base", "8", "--Task_basef", "8",
    ])
    files = sorted(os.listdir(out))
    assert files == ["f0.png", "f1.png"]
    pred = imageio.imread(out / "f0.png")
    assert pred.dtype == np.uint16
    assert pred.shape == (200, 200)
    assert pred.max() <= 5100


def test_predict_translate_folder(tmp_path):
    """--translate BtoA: stage-2 G_B (real/LQ -> syn/HQ) served over a folder.
    The reference has no translation inference path at all; this covers our
    predict.py extension (random-init weights — the surface under test is the
    CLI chain: decode -> pad -> jitted G_B apply -> crop-back -> uint16)."""
    import imageio

    rng = np.random.default_rng(0)
    dd, di, out = tmp_path / "d", tmp_path / "img", tmp_path / "out"
    os.makedirs(dd)
    os.makedirs(di)
    for i in range(2):
        imageio.imwrite(dd / f"f{i}.png",
                        rng.integers(0, 5000, (100, 140)).astype(np.uint16))
        imageio.imwrite(di / f"f{i}.png",
                        rng.integers(0, 255, (100, 140, 3)).astype(np.uint8))

    import predict

    predict.main([
        "--name", "pred_tr_test", "--checkpoints_dir", str(tmp_path / "ckpt"),
        "--input_depth", str(dd), "--input_img", str(di), "--output", str(out),
        "--batch_size", "2", "--compute_dtype", "float32",
        "--translate", "BtoA",
    ])
    files = sorted(os.listdir(out))
    assert files == ["f0.png", "f1.png"]
    pred = imageio.imread(out / "f0.png")
    assert pred.dtype == np.uint16
    assert pred.shape == (100, 140)  # padding cropped back off
    assert pred.max() <= 5100


def _read_bytes(folder):
    return {f: open(os.path.join(folder, f), "rb").read()
            for f in sorted(os.listdir(folder))}


def test_predict_workers_parity(tmp_path):
    """--num_workers N (forked decode/encode pool) is byte-identical to the
    inline path — same files, same ordering, same PNG bytes — including a
    tail chunk (5 frames at batch 2) and the --from_export pad-to-batch
    interaction (the artifact's fixed batch pads the tail with repeats that
    must not be written)."""
    import imageio

    rng = np.random.default_rng(0)
    dd, di = tmp_path / "depth", tmp_path / "img"
    os.makedirs(dd)
    os.makedirs(di)
    for i in range(5):  # odd count: forces a 1-frame tail chunk at batch 2
        imageio.imwrite(dd / f"f{i}.png",
                        rng.integers(0, 6000, (100, 140)).astype(np.uint16))
        imageio.imwrite(di / f"f{i}.png",
                        rng.integers(0, 255, (100, 140, 3)).astype(np.uint8))

    import predict

    net_flags = [
        "--net_args",
        "--ImageDepthf_outf", "8", "--ImageDepthf_basef", "8",
        "--Depthf_outf", "8", "--Depthf_basef", "8",
        "--I2D_base", "8", "--Task_basef", "8",
    ]
    base = ["--name", "pred_wk_test", "--checkpoints_dir", str(tmp_path / "ckpt"),
            "--input_depth", str(dd), "--input_img", str(di),
            "--batch_size", "2", "--compute_dtype", "float32"]
    out0, out2 = tmp_path / "out_inline", tmp_path / "out_pool"
    predict.main(base + ["--output", str(out0), "--num_workers", "0"] + net_flags)
    predict.main(base + ["--output", str(out2), "--num_workers", "2"] + net_flags)
    inline, pooled = _read_bytes(out0), _read_bytes(out2)
    assert list(inline) == [f"f{i}.png" for i in range(5)]
    assert inline == pooled  # byte-identical PNGs, identical file set

    # --from_export: fixed batch 2 pads the 1-frame tail; pool parity again
    exp = tmp_path / "export"
    predict.main(base + ["--output", str(tmp_path / "out_exp0"),
                         "--export", str(exp)] + net_flags)
    eb = ["--from_export", str(exp), "--input_depth", str(dd),
          "--input_img", str(di), "--compute_dtype", "float32"]
    oute0, oute2 = tmp_path / "out_e_inline", tmp_path / "out_e_pool"
    predict.main(eb + ["--output", str(oute0), "--num_workers", "0"])
    predict.main(eb + ["--output", str(oute2), "--num_workers", "2"])
    e_inline, e_pooled = _read_bytes(oute0), _read_bytes(oute2)
    assert list(e_inline) == [f"f{i}.png" for i in range(5)]  # pad frames not written
    assert e_inline == e_pooled


def test_predict_i2d_folder(tmp_path):
    """--I2D serving: depth from RGB alone (no --input_depth) through the
    stage-1 Image-Guidance nets. The reference has no I2D serving path at
    all (its only dump is the row-cropped --save_all quirk,
    I2D_model.py:170-181); this covers our predict.py extension."""
    import imageio

    rng = np.random.default_rng(0)
    di = tmp_path / "img"
    out = tmp_path / "out"
    os.makedirs(di)
    for i in range(3):
        imageio.imwrite(di / f"f{i}.png",
                        rng.integers(0, 255, (100, 140, 3)).astype(np.uint8))

    import predict

    predict.main([
        "--name", "pred_i2d_test", "--checkpoints_dir", str(tmp_path / "ckpt"),
        "--input_img", str(di), "--output", str(out),
        "--batch_size", "2", "--compute_dtype", "float32", "--I2D",
        "--net_args", "--Imagef_outf", "8", "--Imagef_basef", "8",
        "--Task_basef", "8",
    ])
    files = sorted(os.listdir(out))
    assert files == ["f0.png", "f1.png", "f2.png"]
    pred = imageio.imread(out / "f0.png")
    assert pred.dtype == np.uint16
    assert pred.shape == (100, 140)  # padding cropped back off
    assert pred.max() <= 5100
