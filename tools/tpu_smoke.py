"""~2-minute TPU smoke test: every Pallas kernel once on the real chip.

CI drives the kernels in interpret mode (real kernel code, interpreted
semantics), which cannot see Mosaic-specific behavior — the round-2 bf16
matmul rounding and the round-3 stats-output block-shape rejection were
both invisible on CPU. This runs each kernel at small shapes on whatever
the default backend is (intended: the real TPU) and asserts against the
jnp twins, so that class of divergence is caught before the driver
bench does. Run it after any kernel change, before committing:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_smoke.py

Exit 0 = all kernels executed on-device and matched. Shapes are kept
small; with a warm compile cache the wall is dominated by ~10 compiles.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import numpy as np


def _check(name, got, ref, tol, failures):
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    err = float(np.max(np.abs(got - ref))) if got.size else 0.0
    ok = np.isfinite(err) and err <= tol
    print(f"  {name:34s} max_err={err:.2e} tol={tol:.0e} "
          f"{'ok' if ok else 'FAIL'}")
    if not ok:
        failures.append(name)


def main() -> int:
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    backend = jax.default_backend()
    print(f"tpu_smoke: backend={backend}")
    if backend != "tpu":
        print("  (not on TPU — kernels will run their real-device path "
              "for this backend; Mosaic coverage needs the chip)")

    rng = np.random.default_rng(0)
    failures: list[str] = []
    dt = jnp.bfloat16 if backend == "tpu" else jnp.float32
    # bf16 inputs vs f32 twins: inputs are exact bf16 values, so the only
    # drift is kernel-internal; 2e-2 catches wrong-result bugs while
    # tolerating rounding.
    tol = 2e-2 if backend == "tpu" else 1e-4

    # --- norms ---------------------------------------------------------
    from said_tpu.ops.norms import (
        _group_norm_jnp,
        _group_norm_masked_jnp,
        _layer_norm_jnp,
    )
    from said_tpu.ops.pallas_norms import (
        group_norm_masked_pallas,
        group_norm_masked_pallas_blocked,
        group_norm_pallas,
        group_norm_pallas_blocked,
        layer_norm_pallas,
    )

    b, t, c, g = 2, 256, 192, 32
    x = jnp.asarray(rng.standard_normal((b, t, c)) * 2 + 3, dt)
    sc = jnp.asarray(rng.standard_normal(c), jnp.float32)
    bi = jnp.asarray(rng.standard_normal(c), jnp.float32)
    lens = np.array([256, 150])
    mask = jnp.asarray(np.arange(t)[None, :] < lens[:, None])

    ref = _group_norm_jnp(x, g, sc, bi, act="silu")
    _check("group_norm", group_norm_pallas(x, sc, bi, g, act="silu"),
           ref, tol, failures)
    _check("group_norm_blocked",
           group_norm_pallas_blocked(x, sc, bi, g, act="silu"),
           ref, tol, failures)
    refm = _group_norm_masked_jnp(x, g, sc, bi, mask)
    mvalid = np.asarray(mask)[:, :, None]
    _check("group_norm_masked",
           np.where(mvalid, np.asarray(
               group_norm_masked_pallas(x, sc, bi, mask, g), np.float32), 0),
           np.where(mvalid, np.asarray(refm, np.float32), 0), tol, failures)
    _check("group_norm_masked_blocked",
           np.where(mvalid, np.asarray(
               group_norm_masked_pallas_blocked(x, sc, bi, mask, g),
               np.float32), 0),
           np.where(mvalid, np.asarray(refm, np.float32), 0), tol, failures)
    _check("layer_norm", layer_norm_pallas(x, sc, bi),
           _layer_norm_jnp(x, sc, bi), tol, failures)

    # --- attention -----------------------------------------------------
    from said_tpu.ops.pallas_attention import (
        _dense_flat,
        _flash_tpu_packed,
        _flash_tpu_packed_blocked,
    )

    h, d = 6, 32
    q = jnp.asarray(rng.standard_normal((2, 256, h * d)), dt)
    k = jnp.asarray(rng.standard_normal((2, 256, h * d)), dt)
    v = jnp.asarray(rng.standard_normal((2, 256, h * d)), dt)
    aref = _dense_flat(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), h
    )
    _check("flash_packed",
           _flash_tpu_packed(q, k, v, num_heads=h, block_q=128),
           aref, tol, failures)
    _check("flash_packed_blocked",
           _flash_tpu_packed_blocked(q, k, v, num_heads=h),
           aref, tol, failures)
    lens_a = jnp.asarray([256, 130], jnp.int32)
    aref_l = _dense_flat(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        h, lengths=lens_a,
    )
    got_l = _flash_tpu_packed(
        q, k, v, lens_a, num_heads=h, block_q=128, has_lens=True
    )
    valid = (np.arange(256)[None, :, None] < np.asarray(lens_a)[:, None, None])
    _check("flash_packed_lengths",
           np.where(valid, np.asarray(got_l, np.float32), 0),
           np.where(valid, np.asarray(aref_l, np.float32), 0), tol, failures)

    # --- fused GEGLU FF ------------------------------------------------
    from said_tpu.ops.pallas_ffn import _geglu_ffn_jnp, geglu_ffn_pallas

    inner = c * 4
    xf = jnp.asarray(rng.standard_normal((2, 256, c)), dt)
    w1 = jnp.asarray(rng.standard_normal((c, inner * 2)) * 0.05, dt)
    b1 = jnp.asarray(rng.standard_normal(inner * 2) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((inner, c)) * 0.05, dt)
    b2 = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    _check("geglu_ffn", geglu_ffn_pallas(xf, w1, b1, w2, b2),
           _geglu_ffn_jnp(xf, w1, b1, w2, b2), tol, failures)

    # --- blocked flash at ENCODER width (12 heads x 64) ----------------
    # The round-3 6-minute bench exposed a VMEM OOM when the 768-wide
    # wav2vec2 encoder hit block sizes tuned for the 192-wide denoiser;
    # this runs the production _blocked_blocks sizing at that width.
    from said_tpu.ops.pallas_attention import (
        _blocked_blocks,
        _flash_tpu_packed_blocked,
    )

    hw, dw = 12, 64
    qw = jnp.asarray(rng.standard_normal((1, 2560, hw * dw)), dt)
    kw = jnp.asarray(rng.standard_normal((1, 2560, hw * dw)), dt)
    vw = jnp.asarray(rng.standard_normal((1, 2560, hw * dw)), dt)
    wref = _dense_flat(
        qw.astype(jnp.float32), kw.astype(jnp.float32),
        vw.astype(jnp.float32), hw,
    )
    bqw, bkw = _blocked_blocks(hw * dw, hw, np.dtype(dt).itemsize)
    _check("flash_blocked_wide768",
           _flash_tpu_packed_blocked(
               qw, kw, vw, num_heads=hw, block_q=bqw, block_k=bkw),
           wref, tol, failures)

    # --- fused strided conv+GELU (wav2vec2 feature extractor) ----------
    from said_tpu.ops.pallas_conv import (
        _strided_conv_gelu_jnp,
        strided_conv_gelu_pallas,
    )

    for kk in (2, 3):
        xc = jnp.asarray(rng.standard_normal((2, 515, 256)), dt)
        wc = jnp.asarray(rng.standard_normal((kk, 256, 256)) * 0.05, dt)
        _check(f"strided_conv_gelu_k{kk}",
               strided_conv_gelu_pallas(xc, wc, block_t=64),
               _strided_conv_gelu_jnp(xc, wc), tol, failures)

    # --- sequence-parallel custom partitioning (1-device mesh) ---------
    from tools.sp_probe import run_sp_probe

    err = run_sp_probe(t=2560)
    ok = err < 0.05
    print(f"  {'flash_sp_on_mesh':34s} max_err={err:.2e} tol=5e-02 "
          f"{'ok' if ok else 'FAIL'}")
    if not ok:
        failures.append("flash_sp_on_mesh")

    wall = time.perf_counter() - t0
    if failures:
        print(f"tpu_smoke: FAIL ({len(failures)}): {failures} [{wall:.0f}s]")
        return 1
    print(f"tpu_smoke: all kernels ok on {backend} [{wall:.0f}s]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
