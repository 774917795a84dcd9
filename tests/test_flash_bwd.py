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


def test_chunked_bwd_bf16_mixed_precision_grads():
    """bf16 inputs switch the blockwise backward to bf16 MXU operands
    with f32 accumulation and f32 softmax statistics — the same
    arrangement as the forward kernel (f32 matmuls run at ~1/4 the bf16
    rate on the MXU, and the all-f32 backward dominated the 6-minute
    train step). Grads must match the full-f32 dense reference to
    bf16-class tolerance."""
    b, t, s = 2, 64, 130
    qf = _rand((b, t, INNER), 10)
    kf, vf = _rand((b, s, INNER), 11), _rand((b, s, INNER), 12)
    gf = _rand((b, t, INNER), 13)
    want = _dense_grads(qf, kf, vf, gf)

    q, k, v, g = (x.astype(jnp.bfloat16) for x in (qf, kf, vf, gf))
    o = _dense_flat(qf, kf, vf, H).astype(jnp.bfloat16)
    got = _chunked_attn_bwd(q, k, v, o, g, H, block_k=32)
    for got_i, want_i, name in zip(got, want, "q k v".split()):
        got_i = np.asarray(got_i, np.float32)
        want_i = np.asarray(want_i)
        assert got_i.dtype == np.float32 and got_i.shape == want_i.shape
        # bf16 has ~3 decimal digits; compare on the grad's own scale
        scale = np.abs(want_i).max()
        np.testing.assert_allclose(
            got_i / scale, want_i / scale, atol=3e-2, err_msg=f"d{name}"
        )
        # and the direction must agree tightly (cosine similarity)
        cos = float(
            (got_i * want_i).sum()
            / (np.linalg.norm(got_i) * np.linalg.norm(want_i))
        )
        assert cos > 0.999, (name, cos)


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


def test_train_step_jaxpr_at_6min_scale_has_no_dense_scores(monkeypatch):
    """Trace (shape-level, nothing executes) a FULL training step at the
    6-minute-clip window (T=21600) with the flash/SP attention impls and
    assert no intermediate anywhere in the jaxpr — forward, backward,
    optimizer — reaches dense-score size. This is the memory property
    that makes sequence-parallel training viable at the clip lengths SP
    exists for; the reference materializes (T, T) even forward
    (said/model/ldm/attention.py:101-110)."""
    monkeypatch.setenv("SAID_FLASH_INTERPRET", "1")  # route = packed kernel
    from said_tpu.diffusion.schedule import DiffusionSchedule
    from said_tpu.models.said import SAID
    from said_tpu.models.wav2vec2 import Wav2Vec2Config
    from said_tpu.train.said_train import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )

    small = Wav2Vec2Config(
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        conv_bias=False, hidden_size=24, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=48,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        output_hidden_size=24,
    )
    model = SAID(
        audio_config=small,
        self_attn_impl="flash_sp",
        encoder_attn_impl="flash_sp",
    )
    t_frames = 21600
    wave_len = (16000 * t_frames) // 60

    def shaped(shape, dtype=jnp.float32):
        return jax.ShapeDtypeStruct(shape, dtype)

    schedule = DiffusionSchedule.create(model.diffusion_steps)
    config = TrainConfig(encoder_train_mode=False)

    params = jax.eval_shape(
        lambda r: model.init(
            {"params": r},
            jnp.zeros((1, 12, 32)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 12, 24)),
        )["params"],
        jax.random.PRNGKey(0),
    )
    # the audio-encoder params too (init merges both in the CLI helper)
    enc = jax.eval_shape(
        lambda r: model.init(
            {"params": r}, jnp.zeros((1, 3200)), 12,
            method=SAID.get_audio_embedding,
        )["params"],
        jax.random.PRNGKey(0),
    )
    params = {**dict(enc), **dict(params)}

    state_shape = jax.eval_shape(lambda p: create_train_state(config, p), params)
    batch = {
        "waveform": shaped((1, wave_len)),
        "coeffs": shaped((1, t_frames, 32)),
        "cond": shaped((1,), jnp.bool_),
    }
    step = make_train_step(model, schedule, config)
    jaxpr = jax.make_jaxpr(step)(
        state_shape, batch, jax.ShapeDtypeStruct((2,), jnp.uint32)
    )
    biggest = _max_eqn_elems(jaxpr)

    heads = 2
    dense_scores = heads * t_frames * t_frames  # ~9.3e8 elements
    block_bound = heads * t_frames * max(pa._BWD_BLOCK_K, 2048) * 2
    assert biggest < dense_scores // 4, (
        f"train step materializes a {biggest}-element tensor at T={t_frames}"
    )
    assert biggest <= block_bound, (biggest, block_bound)
