"""Blockwise flash-attention backward: grad parity + memory scaling.

The custom-vjp backward of ``flash_attention_flat`` / ``flash_attention_flat_sp``
recomputes scores blockwise beyond ``_BWD_DENSE_MAX`` keys
(``_chunked_attn_bwd``) so no (T, S) tensor is ever materialized — the
property that makes long-window and sequence-parallel TRAINING viable.
These tests pin (1) numerical agreement with the dense softmax backward,
(2) the absence of any dense score intermediate in the backward jaxpr,
and (3) grad parity through the custom-partitioned SP kernel on a
frame-sharded mesh with the blockwise path forced on.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import said_tpu.ops.pallas_attention as pa
from said_tpu.ops.pallas_attention import (
    _chunked_attn_bwd,
    _dense_flat,
    flash_attention_flat,
    flash_attention_flat_sp,
)

H, D = 2, 16
INNER = H * D


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32
    )


def _dense_grads(q, k, v, g, lengths=None):
    _, vjp = jax.vjp(lambda a, b, c: _dense_flat(a, b, c, H, lengths), q, k, v)
    return vjp(g)


@pytest.mark.parametrize("s", [96, 130])  # 130: padded tail block
@pytest.mark.parametrize("use_lens", [False, True])
def test_chunked_bwd_matches_dense_vjp(s, use_lens):
    b, t = 2, 64
    q, k, v = _rand((b, t, INNER), 0), _rand((b, s, INNER), 1), _rand((b, s, INNER), 2)
    g = _rand((b, t, INNER), 3)
    lengths = jnp.asarray([s - 7, s]) if use_lens else None
    o = _dense_flat(q, k, v, H, lengths)

    want = _dense_grads(q, k, v, g, lengths)
    got = _chunked_attn_bwd(q, k, v, o, g, H, lengths, block_k=32)
    for got_i, want_i, name in zip(got, want, "q k v".split()):
        np.testing.assert_allclose(
            np.asarray(got_i), np.asarray(want_i), atol=2e-5, rtol=1e-4,
            err_msg=f"d{name}",
        )


def test_flash_flat_grad_routes_blockwise(monkeypatch):
    """End-to-end: jax.grad through flash_attention_flat takes the
    chunked path (threshold forced low) and matches the dense grads."""
    monkeypatch.setattr(pa, "_BWD_DENSE_MAX", 32)
    monkeypatch.setattr(pa, "_BWD_BLOCK_K", 16)
    b, t = 1, 80
    q, k, v = _rand((b, t, INNER), 4), _rand((b, t, INNER), 5), _rand((b, t, INNER), 6)

    def loss_flash(q, k, v):
        return (flash_attention_flat(q, k, v, H) ** 2).sum()

    def loss_dense(q, k, v):
        return (_dense_flat(q, k, v, H) ** 2).sum()

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for got_i, want_i in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(got_i), np.asarray(want_i), atol=3e-5, rtol=1e-4
        )


def _max_eqn_elems(jaxpr) -> int:
    """Largest intermediate (in elements) anywhere in a jaxpr, including
    nested jaxprs (scan bodies, cond branches, pjit calls)."""
    best = 0

    def sub_jaxprs(v):
        if hasattr(v, "jaxpr"):  # ClosedJaxpr
            yield v.jaxpr
        elif hasattr(v, "eqns"):  # Jaxpr
            yield v
        elif isinstance(v, (tuple, list)):
            for item in v:
                yield from sub_jaxprs(item)

    def visit(jx):
        nonlocal best
        for eqn in jx.eqns:
            for var in eqn.outvars:
                shape = getattr(var.aval, "shape", None)
                if shape is not None:
                    best = max(best, int(np.prod(shape, dtype=np.int64)))
            for p in eqn.params.values():
                for j in sub_jaxprs(p):
                    visit(j)

    visit(jaxpr.jaxpr if hasattr(jaxpr, "jaxpr") else jaxpr)
    return best


def test_backward_has_no_dense_score_intermediate(monkeypatch):
    """The backward jaxpr must contain nothing of O(T·S) size: memory is
    O(T·block_k), the whole point of the blockwise backward."""
    monkeypatch.setattr(pa, "_BWD_DENSE_MAX", 256)
    b, t = 1, 512
    block_k = 64
    monkeypatch.setattr(pa, "_BWD_BLOCK_K", block_k)
    q, k, v = _rand((b, t, INNER), 7), _rand((b, t, INNER), 8), _rand((b, t, INNER), 9)
    g = _rand((b, t, INNER), 10)

    _, f_vjp = jax.vjp(lambda a, b_, c: flash_attention_flat(a, b_, c, H), q, k, v)
    bwd_jaxpr = jax.make_jaxpr(f_vjp)(g)
    biggest = _max_eqn_elems(bwd_jaxpr)

    dense_score_elems = b * H * t * t  # 524288
    block_elems = b * H * t * block_k  # 65536
    assert biggest < dense_score_elems // 2, (
        f"backward materializes a {biggest}-element tensor "
        f"(dense score would be {dense_score_elems})"
    )
    assert biggest <= 2 * block_elems  # stacked dk/dv ys stay blockwise


def test_sp_chunked_bwd_on_mesh(monkeypatch):
    """Grad parity through the custom-partitioned SP kernel on a 4-way
    frame-sharded mesh with the blockwise backward forced on — the SP
    training path at the memory scaling it ships with."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    monkeypatch.setattr(pa, "_BWD_DENSE_MAX", 32)
    monkeypatch.setattr(pa, "_BWD_BLOCK_K", 32)
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(np.array(jax.devices()[:4]), ("seq",))

    b, t = 1, 128
    q, k, v = _rand((b, t, INNER), 11), _rand((b, t, INNER), 12), _rand((b, t, INNER), 13)

    def loss_sp(q, k, v):
        return (flash_attention_flat_sp(q, k, v, H) ** 2).sum()

    def loss_dense(q, k, v):
        return (_dense_flat(q, k, v, H) ** 2).sum()

    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)

    shard = NamedSharding(mesh, P(None, "seq", None))
    repl = NamedSharding(mesh, P())
    qs = jax.device_put(q, shard)
    ks, vs = jax.device_put(k, repl), jax.device_put(v, repl)
    got = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))(qs, ks, vs)

    for got_i, want_i in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(got_i), np.asarray(want_i), atol=3e-5, rtol=1e-4
        )
