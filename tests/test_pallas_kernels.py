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
