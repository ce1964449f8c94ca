import numpy as np
import jax.numpy as jnp
import pytest

from desr_tpu.ops import optim as O


def test_adam_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((4, 5)).astype(np.float32)
    grads = [rng.standard_normal((4, 5)).astype(np.float32) for _ in range(5)]

    # torch
    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.Adam([tp], lr=2e-4, betas=(0.5, 0.999), weight_decay=1e-4)
    for g in grads:
        opt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        opt.step()

    # ours
    params = {"w": jnp.asarray(p0)}
    state = O.adam_init(params)
    for g in grads:
        params, state = O.adam_update(
            {"w": jnp.asarray(g)}, state, params, lr=2e-4, b1=0.5, b2=0.999, weight_decay=1e-4
        )
    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_lr_schedule_linear():
    # flat for n_epochs, then linear decay to zero over n_epochs_decay+1
    base, n, nd = 2e-4, 10, 10
    assert O.lr_schedule("linear", 1, base, n, nd) == pytest.approx(base)
    assert O.lr_schedule("linear", 10, base, n, nd) == pytest.approx(base * (1 - 1 / 11))
    assert O.lr_schedule("linear", 20, base, n, nd) == pytest.approx(base * (1 - 11 / 11))


def test_lr_schedule_matches_torch_lambda():
    torch = pytest.importorskip("torch")
    base, n, nd, ec = 1e-3, 5, 7, 1
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=base)

    def lambda_rule(epoch):
        return 1.0 - max(0, epoch + ec - n) / float(nd + 1)

    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda=lambda_rule)
    for epoch in range(12):
        want = opt.param_groups[0]["lr"]
        got = O.lr_schedule("linear", epoch, base, n, nd, epoch_count=ec)
        assert got == pytest.approx(want, rel=1e-9), epoch
        sched.step()
