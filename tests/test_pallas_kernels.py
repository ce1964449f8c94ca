import numpy as np
import jax.numpy as jnp
import pytest

from desr_tpu.ops import pallas_kernels as PK


def _rand(shape, seed):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, size=shape).astype(np.float32)


@pytest.mark.parametrize("shape", [(2, 33, 47, 1), (1, 128, 128, 1), (3, 5, 7, 1)])
def test_masked_loss_sums_matches_reference(shape):
    p = _rand(shape, 0)
    t = _rand(shape, 1)
    m1 = (_rand(shape, 2) > 0).astype(np.float32)
    m2 = (_rand(shape, 3) > -0.5).astype(np.float32)
    want = PK.masked_loss_sums_reference(jnp.asarray(p), jnp.asarray(t),
                                         jnp.asarray(m1), jnp.asarray(m2))
    got = PK.masked_loss_sums(jnp.asarray(p), jnp.asarray(t),
                              jnp.asarray(m1), jnp.asarray(m2), force_interpret=True)
    for g, w in zip(got, want):
        assert float(g) == pytest.approx(float(w), rel=1e-5), (g, w)


def test_masked_loss_sums_zero_masks():
    shape = (1, 16, 16, 1)
    p, t = _rand(shape, 4), _rand(shape, 5)
    zero = jnp.zeros(shape)
    got = PK.masked_loss_sums(jnp.asarray(p), jnp.asarray(t), zero, zero,
                              force_interpret=True)
    assert all(float(g) == 0.0 for g in got)


def test_fused_hole_means_grads_match_composition():
    """custom_vjp wrapper: value AND grad equal the jnp loss composition."""
    import jax
    import jax.numpy as jnp
    from desr_tpu.ops import pallas_kernels as PK

    rng = np.random.default_rng(7)
    shape = (2, 48, 64)
    t = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
    m1 = jnp.asarray((rng.uniform(0, 1, shape) > 0.3).astype(np.float32))
    m2 = jnp.asarray((rng.uniform(0, 1, shape) > 0.5).astype(np.float32))
    p0 = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))

    def ref(p):
        a = jnp.mean(jnp.abs(t * m1 - p * m1))
        b = jnp.mean(jnp.abs(t * m1 * m2 - p * m1 * m2))
        c = jnp.mean(jnp.square(t * m1 * m2 - p * m1 * m2)) * 5
        return a + 2 * b + 3 * c

    def fused(p):
        a, b, c = PK.fused_hole_means(p, t, m1, m2)
        return a + 2 * b + 3 * c

    v1, g1 = jax.value_and_grad(ref)(p0)
    v2, g2 = jax.value_and_grad(fused)(p0)
    assert float(v1) == pytest.approx(float(v2), rel=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_main_model_pallas_losses_flag_matches_default():
    """--pallas_losses: identical loss_G to the jnp path (interpret on CPU)."""
    from desr_tpu.options.train_options import TrainOptions
    from desr_tpu.models.main_model import MainModel

    base = [
        "--model_type", "main", "--name", "t_pk", "--checkpoints_dir",
        "/tmp/desr_pk_ckpt", "--use_image_for_trans", "--use_masked",
        "--norm_loss", "--batch_size", "1", "--compute_dtype", "float32",
        "--num_devices", "1",
        "--ImageDepthf_outf", "8", "--ImageDepthf_basef", "8",
        "--Depthf_outf", "8", "--Depthf_basef", "8", "--Task_basef", "8",
    ]
    rng = np.random.default_rng(11)
    batch = {
        "A_i": rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32),
        "B_i": rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32),
        "A_d": rng.uniform(-1, 1, (1, 128, 128, 1)).astype(np.float32),
        "B_d": rng.uniform(-1, 1, (1, 128, 128, 1)).astype(np.float32),
        "K_A": np.tile(np.array([[577.0, 0, 64], [0, 577, 64], [0, 0, 1]],
                                np.float32)[None], (1, 1, 1)),
        "K_B": np.tile(np.array([[577.0, 0, 64], [0, 577, 64], [0, 0, 1]],
                                np.float32)[None], (1, 1, 1)),
        "crop_A": np.array([[0, 128, 0, 128]], np.float32),
        "crop_B": np.array([[0, 128, 0, 128]], np.float32),
    }

    losses = {}
    for flag, extra in [("jnp", []), ("pallas", ["--pallas_losses"])]:
        opt = TrainOptions().parse(base + extra)
        model = MainModel(opt)
        model.setup()
        model.set_input(batch)
        model.calculate()
        losses[flag] = {k: float(v) for k, v in model.metrics.items()}

    for k in ["G", "task_syn", "holes_syn", "holes_syn_l2",
              "holes_real", "holes_real_l2"]:
        assert losses["pallas"][k] == pytest.approx(losses["jnp"][k], rel=1e-4), k
