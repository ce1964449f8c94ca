"""AOT serving export (desr_tpu/serving.py + predict.py --export/--from_export).

The reference has no deployment path; this is a TPU-native addition. The
contract tested: an exported artifact (serialized jax.export graph + npz
weights + manifest) reproduces the live serving CLI's uint16 outputs exactly,
pads tail chunks to the frozen batch size, and rejects mismatched geometry
with a readable error.
"""

import json
import os

import numpy as np
import pytest


def _write_frames(tmp_path, n, rng):
    import imageio
    dd, di = tmp_path / "depth", tmp_path / "img"
    os.makedirs(dd), os.makedirs(di)
    for i in range(n):
        imageio.imwrite(dd / f"f{i}.png",
                        rng.integers(0, 6000, (100, 140)).astype(np.uint16))
        imageio.imwrite(di / f"f{i}.png",
                        rng.integers(0, 255, (100, 140, 3)).astype(np.uint8))
    return dd, di


TINY_NET = ["--net_args",
            "--ImageDepthf_outf", "8", "--ImageDepthf_basef", "8",
            "--Depthf_outf", "8", "--Depthf_basef", "8",
            "--I2D_base", "8", "--Task_basef", "8"]


def test_export_roundtrip_matches_live_serving(tmp_path):
    import imageio
    import predict

    rng = np.random.default_rng(0)
    dd, di = _write_frames(tmp_path, 3, rng)
    # --num_devices 1 on the live run too: the exported graph is lowered for
    # one device, and a different GSPMD partitioning (the 8-virtual-device
    # test mesh) legitimately reorders fp ops by a few ulp
    base = ["--name", "exp_test", "--checkpoints_dir", str(tmp_path / "ckpt"),
            "--input_depth", str(dd), "--input_img", str(di),
            "--batch_size", "2", "--compute_dtype", "float32",
            "--num_devices", "1"]

    art = str(tmp_path / "artifact")
    predict.main(base + ["--output", str(tmp_path / "unused"),
                         "--export", art] + TINY_NET)
    assert sorted(os.listdir(art)) == ["manifest.json", "params.npz",
                                       "serving.jaxexp"]
    manifest = json.load(open(os.path.join(art, "manifest.json")))
    assert manifest["output_key"] == "pred_real_depth"
    assert manifest["batch"]["A_d"][0] == [2, 128, 256, 1]  # padded to /128

    # live serving (same deterministic init — no checkpoint on disk)
    out_live = tmp_path / "out_live"
    predict.main(base + ["--output", str(out_live)] + TINY_NET)

    # served from the artifact: no model classes, tail chunk (frame 3 of 3
    # at batch 2) padded to the frozen batch size and extras dropped
    out_exp = tmp_path / "out_exp"
    predict.main(["--name", "x", "--input_depth", str(dd),
                  "--input_img", str(di), "--output", str(out_exp),
                  "--from_export", art])

    assert sorted(os.listdir(out_exp)) == ["f0.png", "f1.png", "f2.png"]
    for f in sorted(os.listdir(out_live)):
        a = imageio.imread(out_live / f).astype(np.int32)
        b = imageio.imread(out_exp / f).astype(np.int32)
        assert a.shape == b.shape == (100, 140)
        # same math, same weights: XLA re-fuses the replayed StableHLO
        # slightly differently than the fresh trace, so allow 1 uint16 unit
        # (1/5100 of the depth range) on a vanishing pixel fraction
        diff = np.abs(a - b)
        assert diff.max() <= 1, (f, diff.max())
        assert (diff == 0).mean() > 0.999, (f, (diff == 0).mean())

    # geometry guard: wrong shape is rejected with a readable error
    from desr_tpu.serving import load_serving
    fn, params, m = load_serving(art)
    bad = {k: np.zeros((s[0], 64, 64) + tuple(s[3:]), dtype=d)
           if len(s) >= 3 else np.zeros(s, dtype=d)
           for k, (s, d) in m["batch"].items()}
    with pytest.raises(ValueError, match="exported geometry"):
        fn(params, bad)
