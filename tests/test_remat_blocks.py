"""--remat_blocks: block-scoped activation rematerialization equivalence.

Stronger than --remat_tails: each maximal run of conv/norm/act layers is a
jax.checkpoint segment, so only run inputs survive to the backward pass and
the convs themselves are recomputed. Must be numerically transparent: same
losses, same gradients, same training trajectory as the default mode.
"""

import numpy as np

from tests.test_model_i2d import fake_batch, make_opt


def test_remat_blocks_matches_default():
    from desr_tpu.models.i2d_model import I2DModel

    batch = fake_batch()

    base = I2DModel(make_opt(["--no_remat_tails"]))
    base.setup()
    rb = I2DModel(make_opt(["--remat_blocks", "--no_remat_tails"]))
    assert not base.opt.remat_blocks and rb.opt.remat_blocks
    rb.setup()  # same seed -> identical init

    base.set_input(batch)
    base.calculate(stage="test")
    rb.set_input(batch)
    rb.calculate(stage="test")
    for k in ["task_syn", "task_real", "G"]:
        np.testing.assert_allclose(float(rb.metrics[k]), float(base.metrics[k]),
                                   rtol=1e-6, err_msg=k)

    for it in range(3):
        base.set_input(batch)
        base.optimize_parameters(it + 1)
        rb.set_input(batch)
        rb.optimize_parameters(it + 1)
        np.testing.assert_allclose(float(rb.metrics["G"]), float(base.metrics["G"]),
                                   rtol=1e-5, err_msg=f"step {it}")
    # atol: gradient-dead conv biases walk +-lr on recompute fp noise
    # (same bound as tests/test_remat_tails.py)
    atol = 4 * 2e-4
    for k, v in base.params["Task"].items():
        np.testing.assert_allclose(np.asarray(rb.params["Task"][k]), np.asarray(v),
                                   rtol=1e-4, atol=atol, err_msg=k)


def test_remat_blocks_resnet_grads_match():
    """Direct grad check through a resnet generator (ResnetBlock bodies are
    composite layers that self-checkpoint under ctx.remat_blocks)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from desr_tpu.models.layers import Ctx
    from desr_tpu.models.networks import define_G

    net = define_G(3, 1, 8, "resnet_6blocks", norm="instance")
    params = net.init(jax.random.PRNGKey(3))
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 32, 32, 3), jnp.float32)
    base = Ctx(train=True, dtype=jnp.float32)
    rb = dataclasses.replace(base, remat_blocks=True)

    def loss(ctx):
        return lambda p: jnp.sum(jnp.square(net.apply(p, x, ctx)))

    l0, g0 = jax.value_and_grad(loss(base))(params)
    l1, g1 = jax.value_and_grad(loss(rb))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for k in g0:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g0[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
