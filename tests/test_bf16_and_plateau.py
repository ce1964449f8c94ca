"""bf16 numeric tolerance + plateau LR policy coverage (VERDICT weak #5/#10).

The shipping compute dtype is bfloat16 (CLAUDE.md); the rest of the suite
forces float32 for oracle exactness. These tests pin the bf16 path: same
seed/batch, loss terms within bf16 tolerance of the f32 graph, and a training
step that still optimizes. Plateau: the reference's ReduceLROnPlateau is only
stepped when a metric is provided (base_model.py:123-132); main.py now feeds
the epoch's mean test loss (or train loss without --do_test).
"""

import numpy as np
import pytest

from tests.test_model_i2d import fake_batch, make_opt


def test_i2d_bf16_matches_f32_within_tolerance():
    from desr_tpu.models.i2d_model import I2DModel

    batch = fake_batch()
    m32 = I2DModel(make_opt())
    m32.setup()
    m32.set_input(batch)
    m32.calculate(stage="test")

    m16 = I2DModel(make_opt(["--compute_dtype", "bfloat16"]))
    m16.setup()  # same seed -> identical init params
    m16.set_input(batch)
    m16.calculate(stage="test")

    for k in ["task_syn", "task_real", "G"]:
        a, b = float(m16.metrics[k]), float(m32.metrics[k])
        np.testing.assert_allclose(a, b, rtol=5e-2, atol=1e-3,
                                   err_msg=f"bf16 vs f32 loss {k}")

    # bf16 training must still make progress
    losses = []
    for it in range(3):
        m16.set_input(batch)
        m16.optimize_parameters(it + 1)
        losses.append(float(m16.metrics["G"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_main_bf16_eval_matches_f32():
    from tests.test_model_main import fake_batch as main_batch, make_opt as main_opt
    from desr_tpu.models.main_model import MainModel

    batch = main_batch(b=1)
    m32 = MainModel(main_opt(["--batch_size", "1"]))
    m32.setup()
    m32.set_input(batch)
    m32.calculate(stage="test")

    m16 = MainModel(main_opt(["--batch_size", "1", "--compute_dtype", "bfloat16"]))
    m16.setup()
    m16.set_input(batch)
    m16.calculate(stage="test")

    # the loss tail runs f32 on f32-cast net outputs; bf16 affects the convs
    a, b = float(m16.metrics["G"]), float(m32.metrics["G"])
    np.testing.assert_allclose(a, b, rtol=8e-2, atol=2e-3,
                               err_msg="main-stage bf16 vs f32 total loss")
    for k in ["task_syn", "task_real_by_depth", "holes_syn"]:
        np.testing.assert_allclose(float(m16.metrics[k]), float(m32.metrics[k]),
                                   rtol=1e-1, atol=2e-3, err_msg=k)


def test_plateau_policy_steps_on_stalled_metric():
    from desr_tpu.models.base_model import BaseModel

    class _Opt:
        lr_policy = "plateau"
        lr = 1e-3
        n_epochs = 10
        n_epochs_decay = 10
        compute_dtype = "float32"

    m = BaseModel.__new__(BaseModel)
    m.opt = _Opt()
    m.lr = 1e-3

    # improving metric: LR must hold
    for e, v in enumerate([1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3]):
        m.update_learning_rate(e, metric=v)
    assert m.lr == pytest.approx(1e-3)

    # stalled metric: LR must decay x0.2
    for e in range(8):
        m.update_learning_rate(e, metric=0.3)
    assert m.lr == pytest.approx(1e-3 * 0.2)

    # no metric (reference behavior without a feed): no step, no crash
    lr_before = m.lr
    m.update_learning_rate(99, metric=None)
    assert m.lr == lr_before


def test_main_py_feeds_plateau_metric():
    """The driver must pass a metric into update_learning_rate (wiring test)."""
    import main as driver
    import inspect

    src = inspect.getsource(driver.main)
    assert "update_learning_rate(epoch, metric=plateau_metric)" in src
    assert "plateau_metric = float(next(iter(" in src
