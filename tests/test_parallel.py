"""Data-parallel training over the 8-virtual-device CPU mesh.

The TPU-native analog of multi-GPU DataParallel testing (SURVEY.md §2.13):
batch sharded over 'data', params/optimizer replicated, gradient all-reduce
inserted by GSPMD inside the jitted step.
"""

import numpy as np
import jax
import pytest

from desr_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from desr_tpu.options.train_options import TrainOptions


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_layout():
    mesh = make_mesh()
    batch = {"x": np.zeros((8, 4, 4, 1), np.float32), "K": np.zeros((8, 3, 3), np.float32)}
    sharded = shard_batch(batch, mesh)
    # leading axis split over 8 devices
    shard_shapes = [s.data.shape for s in sharded["x"].addressable_shards]
    assert all(s == (1, 4, 4, 1) for s in shard_shapes)


def test_i2d_data_parallel_8dev():
    from desr_tpu.models.i2d_model import I2DModel

    argv = [
        "--model_type", "I2D", "--name", "t_dp", "--checkpoints_dir", "/tmp/desr_dp_ckpt",
        "--Imagef_outf", "8", "--Imagef_basef", "8", "--Task_basef", "8",
        "--batch_size", "8", "--compute_dtype", "float32",
    ]
    opt = TrainOptions().parse(argv)
    model = I2DModel(opt)
    model.setup()

    rng = np.random.default_rng(0)
    batch = {
        "A_i": rng.uniform(-1, 1, (8, 128, 128, 3)).astype(np.float32),
        "B_i": rng.uniform(-1, 1, (8, 128, 128, 3)).astype(np.float32),
        "A_d": rng.uniform(-1, 1, (8, 128, 128, 1)).astype(np.float32),
        "B_d": rng.uniform(-1, 1, (8, 128, 128, 1)).astype(np.float32),
    }
    model.set_input(batch)
    model.optimize_parameters(1)
    loss8 = float(model.metrics["G"])
    assert np.isfinite(loss8)

    # the replicated params stay consistent across devices
    w = model.params["Task"]["model.model.0.weight"]
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(s, shards[0])


def test_dp_matches_single_device_loss():
    """Global-mean loss over a sharded batch == loss over the same batch on 1 device."""
    from desr_tpu.models.i2d_model import I2DModel

    argv = [
        "--model_type", "I2D", "--name", "t_dp2", "--checkpoints_dir", "/tmp/desr_dp2_ckpt",
        "--Imagef_outf", "8", "--Imagef_basef", "8", "--Task_basef", "8",
        "--batch_size", "8", "--compute_dtype", "float32",
    ]
    opt = TrainOptions().parse(argv)
    rng = np.random.default_rng(1)
    batch = {
        "A_i": rng.uniform(-1, 1, (8, 128, 128, 3)).astype(np.float32),
        "B_i": rng.uniform(-1, 1, (8, 128, 128, 3)).astype(np.float32),
        "A_d": rng.uniform(-1, 1, (8, 128, 128, 1)).astype(np.float32),
        "B_d": rng.uniform(-1, 1, (8, 128, 128, 1)).astype(np.float32),
    }

    m8 = I2DModel(opt)
    m8.setup()
    m8.set_input(batch)
    m8.calculate()
    loss8 = float(m8.metrics["task_syn"])

    m1 = I2DModel(opt)
    m1.mesh = make_mesh(jax.devices()[:1])
    m1.setup()
    m1.set_input(batch)
    m1.calculate()
    loss1 = float(m1.metrics["task_syn"])
    assert loss8 == pytest.approx(loss1, rel=1e-5)


def test_shard_batch_spatial_layout():
    mesh = make_mesh(spatial=4)
    assert mesh.axis_names == ("data", "spatial")
    batch = {"x": np.zeros((2, 64, 64, 1), np.float32),
             "K": np.zeros((2, 3, 3), np.float32),
             "crop": np.zeros((2, 4), np.float32)}
    sharded = shard_batch(batch, mesh)
    # (data=2, spatial=4): image split B/2 x H/4; K and crop only on batch
    assert {s.data.shape for s in sharded["x"].addressable_shards} == {(1, 16, 64, 1)}
    assert {s.data.shape for s in sharded["K"].addressable_shards} == {(1, 3, 3)}


def test_spatial_matches_single_device_loss():
    """2x2 (data x spatial) mesh: H-sharded convs (GSPMD halo exchange)
    produce the same loss as the unsharded program."""
    from desr_tpu.models.i2d_model import I2DModel

    argv = [
        "--model_type", "I2D", "--name", "t_sp", "--checkpoints_dir", "/tmp/desr_sp_ckpt",
        "--Imagef_outf", "8", "--Imagef_basef", "8", "--Task_basef", "8",
        "--batch_size", "2", "--compute_dtype", "float32",
        "--num_devices", "4", "--spatial_devices", "2",
    ]
    opt = TrainOptions().parse(argv)
    rng = np.random.default_rng(2)
    batch = {
        "A_i": rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32),
        "B_i": rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32),
        "A_d": rng.uniform(-1, 1, (2, 128, 128, 1)).astype(np.float32),
        "B_d": rng.uniform(-1, 1, (2, 128, 128, 1)).astype(np.float32),
    }

    msp = I2DModel(opt)
    assert msp.mesh.shape == {"data": 2, "spatial": 2}
    msp.setup()
    msp.set_input(batch)
    msp.calculate()
    loss_sp = float(msp.metrics["task_syn"])

    m1 = I2DModel(opt)
    m1.mesh = make_mesh(jax.devices()[:1])
    m1.setup()
    m1.set_input(batch)
    m1.calculate()
    loss_1 = float(m1.metrics["task_syn"])
    assert loss_sp == pytest.approx(loss_1, rel=1e-5)


def test_spatial_train_step_runs(capfd):
    """One full optimize_parameters on the 2x2 mesh stays finite, keeps
    params replicated, compiles WITHOUT GSPMD involuntary-rematerialization
    fallbacks (the spatial_anchor layout pins), and carries the expected
    collectives: grad all-reduce + halo-exchange collective-permute."""
    from desr_tpu.models.i2d_model import I2DModel

    argv = [
        "--model_type", "I2D", "--name", "t_sp2", "--checkpoints_dir", "/tmp/desr_sp2_ckpt",
        "--Imagef_outf", "8", "--Imagef_basef", "8", "--Task_basef", "8",
        "--batch_size", "2", "--compute_dtype", "float32",
        "--num_devices", "4", "--spatial_devices", "2",
    ]
    opt = TrainOptions().parse(argv)
    rng = np.random.default_rng(3)
    batch = {
        "A_i": rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32),
        "B_i": rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32),
        "A_d": rng.uniform(-1, 1, (2, 128, 128, 1)).astype(np.float32),
        "B_d": rng.uniform(-1, 1, (2, 128, 128, 1)).astype(np.float32),
    }
    model = I2DModel(opt)
    model.setup()
    model.set_input(batch)

    # HLO-level checks on the dp x sp program
    lowered = model._train_step.lower(model.params, model.opt_state_G,
                                      model._batch, model.step_rng(),
                                      model.lr_scalar())
    hlo = lowered.compile().as_text()
    assert "all-reduce" in hlo, "gradient all-reduce missing from the program"
    assert "collective-permute" in hlo, "conv halo exchange missing"
    err = capfd.readouterr().err
    assert "Involuntary full rematerialization" not in err, err

    model.optimize_parameters(1)
    assert np.isfinite(float(model.metrics["G"]))
    w = model.params["Task"]["model.model.0.weight"]
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(s, shards[0])


def test_spatial_remat_blocks_matches_single_device():
    """--remat_blocks under the 2x2 (data x spatial) mesh: jax.checkpoint
    segments wrap spatial_anchor sharding constraints; the sharded loss must
    still match the unsharded program exactly."""
    from desr_tpu.models.i2d_model import I2DModel

    argv = [
        "--model_type", "I2D", "--name", "t_sp_rb",
        "--checkpoints_dir", "/tmp/desr_sp_rb_ckpt",
        "--Imagef_outf", "8", "--Imagef_basef", "8", "--Task_basef", "8",
        "--batch_size", "2", "--compute_dtype", "float32",
        "--num_devices", "4", "--spatial_devices", "2",
        "--remat_blocks", "--no_remat_tails",
    ]
    opt = TrainOptions().parse(argv)
    rng = np.random.default_rng(7)
    batch = {
        "A_i": rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32),
        "B_i": rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32),
        "A_d": rng.uniform(-1, 1, (2, 128, 128, 1)).astype(np.float32),
        "B_d": rng.uniform(-1, 1, (2, 128, 128, 1)).astype(np.float32),
    }

    msp = I2DModel(opt)
    msp.setup()
    msp.set_input(batch)
    msp.optimize_parameters(1)
    loss_sp = float(msp.metrics["G"])
    assert np.isfinite(loss_sp)

    m1 = I2DModel(opt)
    m1.mesh = make_mesh(jax.devices()[:1])
    m1.setup()
    m1.set_input(batch)
    m1.optimize_parameters(1)
    assert loss_sp == pytest.approx(float(m1.metrics["G"]), rel=1e-5)
