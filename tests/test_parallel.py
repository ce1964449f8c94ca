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


def _tiny_translation_model(opt, devices=None):
    from desr_tpu.models import translation_networks as TN
    from desr_tpu.models.translation_model import TranslationModel

    m = TranslationModel(opt)
    gen_opt = TN.default_translator_opt(ngf_img=8, ngf_depth=8, n_blocks=2)
    m.nets["G_A"] = TN.define_Gen(gen_opt, input_type="img_depth")
    m.nets["G_B"] = TN.define_Gen(gen_opt, input_type="img_depth")
    if devices is not None:
        m.mesh = make_mesh(devices)
    m.setup()
    return m


def _translation_batch(b=8, h=64, w=64, seed=11):
    rng = np.random.default_rng(seed)
    da = rng.uniform(-0.5, 1, (b, h, w, 1)).astype(np.float32)
    db = rng.uniform(-0.5, 1, (b, h, w, 1)).astype(np.float32)
    db[db < -0.3] = -1.0
    return {
        "A_depth": da,
        "A_img": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "B_depth": db,
        "B_img": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "A_name": ["a"] * b, "B_name": ["b"] * b,
    }


def test_translation_dp_matches_single_device():
    """Translation (two optimizers, alternating G/D programs, Gu BatchNorm
    discriminator) on the 8-device mesh tracks the single-device trajectory.

    BatchNorm-under-DP semantics (the classic divergence hazard): inside the
    jitted step the batch moments are jnp.mean over the GLOBAL batch axis, so
    GSPMD reduces across shards — sync-BN semantics, identical on 1 or N
    devices. This deliberately deviates from torch.nn.DataParallel
    (networks.py:113-116 / translation_network.py:716), which normalizes each
    replica by its OWN sub-batch moments and keeps only the master replica's
    running-stat update — making the reference's trained stats depend on GPU
    count. Ours is device-count invariant, which is exactly what this test
    pins (QUIRKS #35)."""
    def run_pair(netd, steps):
        argv = [
            "--model_type", "translation", "--name", "t_tr_dp",
            "--checkpoints_dir", "/tmp/desr_tr_dp_ckpt",
            "--batch_size", "8", "--compute_dtype", "float32",
            "--crop_size_h", "64", "--crop_size_w", "64",
            "--netD", netd, "--ndf", "16",
            "--num_iter_gen", "2", "--num_iter_dis", "1",
        ]
        batch = _translation_batch()
        m8 = _tiny_translation_model(TrainOptions().parse(argv))
        m8.set_input(batch)
        m1 = _tiny_translation_model(TrainOptions().parse(argv),
                                     devices=jax.devices()[:1])
        m1.set_input(batch)
        for it in range(1, steps + 1):
            m8.optimize_parameters(it)
            m1.optimize_parameters(it)
        return m8, m1

    # stateless D (basic): bit-tight equivalence of the alternating G/D
    # two-optimizer programs under the sharded batch
    m8, m1 = run_pair("basic", 1)
    for key in ("G_A", "G_B"):
        assert float(m8.metrics[key]) == pytest.approx(
            float(m1.metrics[key]), rel=1e-5), key

    # Gu/BatchNorm D, one g+d iteration: each BN layer's batch moments over
    # the sharded axis reduce in a different summation order than the
    # single-device program, and every layer renormalizes by them — measured
    # 3e-4 rel noise at step 1 (vs 3e-7 for the stateless basic D). The
    # semantics are still global/sync: per-replica moments (what
    # torch.nn.DataParallel computes) would put the running stats off by the
    # sub-batch sampling deviation, orders of magnitude above this bound.
    m8, m1 = run_pair("Gu", 1)
    for key in ("G_A", "G_B", "D_A_depth", "D_B_depth"):
        if key in m8.metrics:
            assert float(m8.metrics[key]) == pytest.approx(
                float(m1.metrics[key]), rel=2e-3), key
    stats_keys = [k for k in m8.params["D_A_depth"] if "running" in k]
    assert stats_keys, "Gu D should carry BatchNorm running stats"
    for net in ("G_A", "D_A_depth"):
        for k, v in m8.params[net].items():
            if "running" in k or "num_batches" in k:
                # momentum-mixed GLOBAL batch moments: the sync-BN semantics
                # pin. Deep-layer moments see inputs renormalized by every
                # earlier BN (measured up to ~1.2e-4 wobble) — still ~20x
                # below the sub-batch sampling deviation (~1e-2) per-replica
                # stats would show
                np.testing.assert_allclose(
                    np.asarray(v), np.asarray(m1.params[net][k]),
                    rtol=2e-3, atol=5e-4, err_msg=f"{net}/{k}")
            else:
                # Adam updates are sign-normalized (~±lr/element at step 1),
                # so moment-noise-scale gradient wobble flips whole updates:
                # bound by ~2 optimizer steps of lr=2e-4, not by fp noise
                np.testing.assert_allclose(
                    np.asarray(v), np.asarray(m1.params[net][k]),
                    rtol=2e-3, atol=6e-4, err_msg=f"{net}/{k}")

    # over more iterations the adversarial loop amplifies that seed noise
    # (measured: 3e-4 -> 7e-3 -> 9e-2 rel over 3 its on both trajectories —
    # GAN dynamics are chaotic in fp32 regardless of device count); assert
    # the trajectories stay finite and coarsely together, not bitwise
    m8, m1 = run_pair("Gu", 3)
    for key in ("G_A", "G_B", "D_A_depth", "D_B_depth"):
        if key in m8.metrics:
            a, b = float(m8.metrics[key]), float(m1.metrics[key])
            assert np.isfinite(a) and np.isfinite(b)
            assert a == pytest.approx(b, rel=0.25), key


def test_sr_dp_remat_matches_single_device():
    """MainSRModel (largest activations) with --remat_blocks on the 8-device
    mesh: one full train step matches the single-device loss — jax.checkpoint
    segments compose with the batch-sharded layout."""
    from desr_tpu.models.main_sr_model import MainSRModel

    argv = [
        "--model_type", "main", "--SR", "--name", "t_sr_dp",
        "--checkpoints_dir", "/tmp/desr_sr_dp_ckpt",
        "--batch_size", "8", "--compute_dtype", "float32",
        "--use_image_for_trans", "--use_masked", "--norm_loss",
        "--ImageDepthf_outf", "8", "--ImageDepthf_basef", "8",
        "--Depthf_outf", "8", "--Depthf_basef", "8",
        "--I2D_base", "8", "--Task_basef", "8",
        "--crop_size_h", "64", "--crop_size_w", "64",
        "--w_syn_norm", "0.1", "--remat_blocks", "--no_remat_tails",
    ]
    b, ch, cw = 8, 64, 64
    h, w = ch * 2, cw * 2
    rng = np.random.default_rng(5)
    depth_a = rng.uniform(-0.5, 1, (b, h, w, 1)).astype(np.float32)
    depth_b = rng.uniform(-0.5, 1, (b, h, w, 1)).astype(np.float32)
    depth_b[depth_b < -0.3] = -1.0
    K = np.tile(np.array([[[577.0, 0, 320], [0, 577, 240], [0, 0, 1]]],
                         np.float32), (b, 1, 1))
    batch = {
        "A_i": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "B_i": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "A_d": depth_a, "B_d": depth_b,
        "K_A": K, "K_B": K.copy(),
        "crop_A": np.tile(np.array([[0, h, 0, w]], np.float32), (b, 1)),
        "crop_B": np.tile(np.array([[0, ch, 0, cw]], np.float32), (b, 1)),
        "A_paths": ["a.png"] * b, "B_paths": ["b.png"] * b,
    }

    m8 = MainSRModel(TrainOptions().parse(argv))
    m8.setup()
    m8.set_input(batch)
    m8.optimize_parameters(1)
    loss8 = float(m8.metrics["G"])
    assert np.isfinite(loss8)

    m1 = MainSRModel(TrainOptions().parse(argv))
    m1.mesh = make_mesh(jax.devices()[:1])
    m1.setup()
    m1.set_input(batch)
    m1.optimize_parameters(1)
    assert loss8 == pytest.approx(float(m1.metrics["G"]), rel=1e-5)


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
