"""Run the flash_sp custom-partitioning program on the REAL device mesh.

The sequence-parallel attention path (``flash_attention_flat_sp``,
said_tpu/ops/pallas_attention.py) had, through round 2, only ever
executed on the virtual CPU mesh used by ``dryrun_multichip``. This
probe jits it over a mesh built from the actual backend's devices (seq=1
on the single available chip) with frame-sharded inputs, so the
custom_partitioning lowering + the packed Pallas kernel both run on TPU
hardware. Returns the max abs error vs an f32 dense reference.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python tools/sp_probe.py
        (or via bench.py's sp_flash_on_chip metric)
"""

from __future__ import annotations

import os

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")


def run_sp_probe(t: int = 2560, heads: int = 6, head_dim: int = 32) -> float:
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from said_tpu.ops.pallas_attention import flash_attention_flat_sp

    # T > _DENSE_MAX (2048) so the route drives the packed Pallas kernel,
    # not the XLA dense fallback.
    inner = heads * head_dim
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    q = jnp.asarray(rng.standard_normal((1, t, inner)), dt)
    k = jnp.asarray(rng.standard_normal((1, t, inner)), dt)
    v = jnp.asarray(rng.standard_normal((1, t, inner)), dt)

    devices = jax.devices()
    mesh = Mesh(np.asarray(devices[:1]), ("seq",))
    shard = NamedSharding(mesh, P(None, "seq", None))
    qs, ks, vs = (jax.device_put(x, shard) for x in (q, k, v))
    out = jax.jit(lambda a, b, c: flash_attention_flat_sp(a, b, c, heads))(
        qs, ks, vs
    )
    out = np.asarray(out, np.float32)

    # f32 dense reference (numpy on host; exact softmax).
    qf = np.asarray(q, np.float32).reshape(t, heads, head_dim)
    kf = np.asarray(k, np.float32).reshape(t, heads, head_dim)
    vf = np.asarray(v, np.float32).reshape(t, heads, head_dim)
    scores = np.einsum("thd,shd->hts", qf, kf) * (head_dim**-0.5)
    scores -= scores.max(axis=-1, keepdims=True)
    w = np.exp(scores)
    w /= w.sum(axis=-1, keepdims=True)
    ref = np.einsum("hts,shd->thd", w, vf).reshape(1, t, inner)

    return float(np.max(np.abs(out - ref)))


if __name__ == "__main__":
    err = run_sp_probe()
    tol = 0.05  # bf16 kernel vs f32 reference
    print(f"sp_probe: max_abs_err={err:.5f} tol={tol} "
          f"{'OK' if err < tol else 'FAIL'}")
    raise SystemExit(0 if err < tol else 1)
