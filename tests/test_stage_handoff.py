"""Cross-stage checkpoint handoff: the README recipe (README.md:58-66).

Stage 1 trains I2D and saves ``latest_net_Image_f.pth`` / ``latest_net_Task.pth``;
the user renames them to ``latest_net_I2D_features.pth`` / ``latest_net_Image2Depth.pth``
in the stage-3 experiment folder; MainModel's tolerant partial load (shape
filter, missing-file tolerance) then seeds the frozen guidance nets.
"""

import os
import shutil

import numpy as np
import pytest

from desr_tpu.options.train_options import TrainOptions


def test_i2d_to_main_checkpoint_handoff(tmp_path):
    ckpt = str(tmp_path)
    # Stage 1: I2D sized so its nets match main's guidance nets
    # (Imagef_outf == ImageDepthf_outf, Task input matches)
    i2d_opt = TrainOptions().parse([
        "--model_type", "I2D", "--name", "handoff", "--checkpoints_dir", ckpt,
        "--Imagef_outf", "8", "--Imagef_basef", "8", "--Task_basef", "8",
        "--compute_dtype", "float32",
    ])
    from desr_tpu.models.i2d_model import I2DModel

    i2d = I2DModel(i2d_opt)
    i2d.setup()
    i2d.save_networks("latest")
    d = os.path.join(ckpt, "handoff")
    assert os.path.exists(os.path.join(d, "latest_net_Image_f.pth"))

    # user renames per the README recipe
    shutil.move(os.path.join(d, "latest_net_Image_f.pth"),
                os.path.join(d, "latest_net_I2D_features.pth"))
    shutil.move(os.path.join(d, "latest_net_Task.pth"),
                os.path.join(d, "latest_net_Image2Depth.pth"))

    # Stage 3: main with matching guidance-net dims, --continue_train
    main_opt = TrainOptions().parse([
        "--model_type", "main", "--name", "handoff", "--checkpoints_dir", ckpt,
        "--use_image_for_trans", "--use_masked",
        "--ImageDepthf_outf", "8", "--ImageDepthf_basef", "8",
        "--I2D_base", "8", "--Depthf_outf", "8", "--Depthf_basef", "8",
        "--Task_basef", "8", "--compute_dtype", "float32",
        "--continue_train",
    ])
    from desr_tpu.models.main_model import MainModel

    main = MainModel(main_opt)
    main.setup()

    # the guidance nets must carry the stage-1 weights
    for src_name, dst_name in [("Image_f", "I2D_features"), ("Task", "Image2Depth")]:
        src = i2d.params[src_name]
        dst = main.params[dst_name]
        matched = 0
        for k, v in src.items():
            if k in dst and np.shape(dst[k]) == np.shape(v):
                np.testing.assert_array_equal(np.asarray(dst[k]), np.asarray(v),
                                              err_msg=f"{dst_name}.{k}")
                matched += 1
        assert matched > 10, f"too few tensors handed off into {dst_name}"

    # missing files (G_A_d etc.) are tolerated: params stay at init, no crash
    assert "G_A_d" in main.params
