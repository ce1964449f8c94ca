import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desr_tpu import checkpoints as C
from desr_tpu.ops.optim import adam_init, adam_update


def test_orbax_train_state_roundtrip(tmp_path):
    params = {"Task": {"model.0.weight": jnp.arange(12.0).reshape(3, 4)}}
    state = adam_init(params)
    params2, state2 = adam_update(
        {"Task": {"model.0.weight": jnp.ones((3, 4))}}, state, params, lr=1e-3)
    tree = {"params": params2, "opt": state2}
    C.save_train_state(tree, str(tmp_path), step=7)
    restored, step = C.load_train_state(tree, str(tmp_path))
    assert step == 7
    np.testing.assert_array_equal(np.asarray(restored["params"]["Task"]["model.0.weight"]),
                                  np.asarray(params2["Task"]["model.0.weight"]))
    np.testing.assert_array_equal(np.asarray(restored["opt"].m["Task"]["model.0.weight"]),
                                  np.asarray(state2.m["Task"]["model.0.weight"]))


def test_nested_netG_B_unwrap(tmp_path):
    """Legacy whole-model translation checkpoints: {'netG_B': state_dict}
    (reference base_model.py:204-205)."""
    torch = pytest.importorskip("torch")

    inner = {"enc_depth.model.0.weight": torch.ones(4, 1, 7, 7)}
    torch.save({"netG_B": inner}, tmp_path / "latest_net_G_A_d.pth")
    params = {"enc_depth.model.0.weight": jnp.zeros((4, 1, 7, 7))}
    out = C.load_net(params, str(tmp_path / "latest_net_G_A_d.pth"), verbose=False)
    np.testing.assert_array_equal(np.asarray(out["enc_depth.model.0.weight"]),
                                  np.ones((4, 1, 7, 7)))


def test_module_prefix_stripped(tmp_path):
    """DataParallel-era checkpoints carry a 'module.' prefix."""
    torch = pytest.importorskip("torch")

    torch.save({"module.model.0.weight": torch.full((2, 2), 3.0)}, tmp_path / "x.pth")
    params = {"model.0.weight": jnp.zeros((2, 2))}
    out = C.load_net(params, str(tmp_path / "x.pth"), verbose=False)
    np.testing.assert_array_equal(np.asarray(out["model.0.weight"]), np.full((2, 2), 3.0))


def test_missing_file_tolerated(tmp_path):
    params = {"w": jnp.ones((2,))}
    with pytest.warns(UserWarning):
        out = C.load_net(params, str(tmp_path / "nope.pth"))
    np.testing.assert_array_equal(np.asarray(out["w"]), np.ones((2,)))
