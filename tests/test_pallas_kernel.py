"""Flash-attention kernel numerics (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from said_tpu.ops.pallas_attention import _dense_reference, _flash_tpu_blocked


@pytest.mark.parametrize("t,s", [(256, 256), (300, 300), (256, 520)])
def test_blocked_flash_matches_dense(t, s):
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (1, t, 2, 32))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, s, 2, 32))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, s, 2, 32))
    ref = _dense_reference(q, k, v)
    got = _flash_tpu_blocked(q, k, v, block_q=128, block_k=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)
