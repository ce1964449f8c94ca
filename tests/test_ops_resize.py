import numpy as np
import jax.numpy as jnp
import pytest

from desr_tpu.ops import resize as R


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, size=shape).astype(np.float32)


@pytest.mark.parametrize("mode", ["bicubic", "bilinear", "nearest"])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((16, 24), (32, 48)), ((32, 48), (16, 24)), ((20, 30), (13, 17)), ((8, 8), (8, 8))],
)
def test_resize_matches_torch(mode, in_hw, out_hw):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = _rand((2, *in_hw, 3), seed=hash((mode, in_hw, out_hw)) % 2**31)
    fn = {"bicubic": R.resize_bicubic, "bilinear": R.resize_bilinear, "nearest": R.resize_nearest}[mode]
    got = np.asarray(fn(jnp.asarray(x), out_hw))
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        kwargs = {} if mode == "nearest" else {"align_corners": False}
        want = F.interpolate(t, size=out_hw, mode=mode, **kwargs).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resize_preserves_dtype():
    x = jnp.ones((1, 8, 8, 1), jnp.bfloat16)
    out = R.resize_bicubic(x, (16, 16))
    assert out.dtype == jnp.bfloat16
