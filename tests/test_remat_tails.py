"""--remat_tails: scoped activation rematerialization equivalence.

The mode recomputes norm/activation tails during the backward pass (saving
only conv outputs for the VJP). It must be numerically transparent: same
losses, same gradients, same training trajectory as the default mode.
"""

import numpy as np

from tests.test_model_i2d import fake_batch, make_opt


def test_remat_tails_matches_default():
    from desr_tpu.models.i2d_model import I2DModel

    batch = fake_batch()

    base = I2DModel(make_opt(["--no_remat_tails"]))  # remat is the DEFAULT now
    base.setup()
    rt = I2DModel(make_opt(["--remat_tails"]))
    assert not base.opt.remat_tails and rt.opt.remat_tails
    rt.setup()  # same seed -> identical init

    # identical eval losses
    base.set_input(batch)
    base.calculate(stage="test")
    rt.set_input(batch)
    rt.calculate(stage="test")
    for k in ["task_syn", "task_real", "G"]:
        np.testing.assert_allclose(float(rt.metrics[k]), float(base.metrics[k]),
                                   rtol=1e-6, err_msg=k)

    # identical 3-step training trajectory (same rng stream, same batches)
    for it in range(3):
        base.set_input(batch)
        base.optimize_parameters(it + 1)
        rt.set_input(batch)
        rt.optimize_parameters(it + 1)
        np.testing.assert_allclose(float(rt.metrics["G"]), float(base.metrics["G"]),
                                   rtol=1e-5, err_msg=f"step {it}")
    # atol: gradient-dead conv biases (before affine-free InstanceNorm) walk
    # +-lr per step on recompute fp noise (see tests/test_lockstep.py)
    atol = 4 * 2e-4  # > 3 steps x lr
    for k, v in base.params["Task"].items():
        np.testing.assert_allclose(np.asarray(rt.params["Task"][k]), np.asarray(v),
                                   rtol=1e-4, atol=atol, err_msg=k)
