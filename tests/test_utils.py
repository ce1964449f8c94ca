import os

import numpy as np
import pytest

from desr_tpu.utils.image_pool import ImagePool
from desr_tpu.utils.util import crop_indx, data_to_meters, mkdirs, tensor2im
from desr_tpu.utils.html import HTML


def test_image_pool_fills_then_replays():
    import random

    random.seed(0)
    pool = ImagePool(pool_size=4)
    first = np.ones((2, 4, 4, 1), np.float32)
    out = pool.query(first)
    np.testing.assert_array_equal(out, first)  # pool not full: pass-through
    assert pool.num_imgs == 2
    second = np.full((2, 4, 4, 1), 2.0, np.float32)
    pool.query(second)
    assert pool.num_imgs == 4
    # after filling, queries mix current batch with replayed history
    third = np.full((8, 4, 4, 1), 3.0, np.float32)
    out = pool.query(third)
    assert out.shape == third.shape
    vals = set(np.unique(out))
    assert 3.0 in vals  # some pass-through
    assert vals - {3.0}, "expected at least one replayed image"


def test_image_pool_size_zero_passthrough():
    pool = ImagePool(0)
    x = np.zeros((3, 2, 2, 1), np.float32)
    assert pool.query(x) is x


def test_tensor2im_shapes():
    x = np.zeros((1, 4, 4, 1), np.float32)
    out = tensor2im(x)
    assert out.shape == (4, 4, 3) and out.dtype == np.uint8
    assert out.max() == 127  # value 0 in [-1,1] -> 127.5 -> clipped cast


def test_data_to_meters_numpy():
    assert data_to_meters(1.0, 5100) == pytest.approx(5.1)
    assert data_to_meters(-1.0, 5100) == pytest.approx(0.0)


def test_crop_indx():
    assert crop_indx("scene0000_00_2_3") == (133, 453, 197, 517)


def test_html_builder(tmp_path):
    page = HTML(str(tmp_path), "test page", refresh=1)
    page.add_header("epoch 1")
    page.add_images(["a.png"], ["label"], ["a.png"])
    page.save()
    html = open(tmp_path / "index.html").read()
    assert "epoch 1" in html and "a.png" in html and "refresh" in html
    assert os.path.isdir(page.get_image_dir())


def test_visualizer_loss_log_and_gallery(tmp_path):
    from types import SimpleNamespace

    from desr_tpu.utils.visualizer import Visualizer

    opt = SimpleNamespace(checkpoints_dir=str(tmp_path), name="vis")
    vis = Visualizer(opt)
    vis.print_current_losses(1, 10, {"task_syn": 0.5}, 0.1, 0.01)
    log = open(tmp_path / "vis" / "loss_log.txt").read()
    assert "task_syn: 0.500" in log
    # planar depth + planar normals + NHWC rgb all render
    visuals = {
        "depth": np.zeros((2, 8, 8), np.float32),
        "normals": np.zeros((2, 3, 8, 8), np.float32),
        "rgb": np.zeros((2, 8, 8, 3), np.float32),
    }
    vis.display_current_results(visuals, epoch=1)
    imgs = os.listdir(tmp_path / "vis" / "web" / "images")
    assert len(imgs) == 3


def test_plots_render_without_wandb():
    from desr_tpu.utils import plots

    visuals = {
        "syn_image": np.zeros((1, 8, 8, 3), np.float32),
        "syn_depth": np.zeros((1, 8, 8), np.float32),
        "pred_syn_depth": np.zeros((1, 8, 8), np.float32),
        "real_image": np.zeros((1, 8, 8, 3), np.float32),
        "real_depth": np.zeros((1, 8, 8), np.float32),
        "pred_real_depth": np.zeros((1, 8, 8), np.float32),
    }
    fig = plots.plot_I2D(None, visuals, step=1)
    assert fig is not None
