"""Cosine noise schedule and DDIM stepping, as pure JAX functions.

Semantics match the scheduler the reference constructs
(``said/model/diffusion.py:100-104``: a DDIM scheduler with
``beta_schedule="squaredcos_cap_v2"`` and default options), so that
coefficient sequences produced by the two frameworks agree within fp
tolerance:

- betas: "squaredcos_cap_v2" — the Nichol & Dhariwal cosine alpha-bar
  ``cos((t + 0.008)/1.008 * pi/2)^2`` with betas capped at 0.999.
- ``set_alpha_to_one=True`` → the final step denoises to alpha_bar = 1.
- ``clip_sample=True`` (range 1.0) → predicted x0 is clamped to [-1, 1]
  inside every step.
- ``timestep_spacing="leading"``, ``steps_offset=0`` →
  timesteps = round(arange(n) * (T // n)) reversed.
- ``init_noise_sigma = 1`` and ``scale_model_input`` is the identity.

Everything here is shape-polymorphic, jit-friendly, and free of Python
control flow on traced values, so the whole denoise chain can live
inside one ``lax.scan`` (see ``said_tpu.diffusion.sampler``).
"""

from __future__ import annotations

import dataclasses
import math
import jax
import jax.numpy as jnp
import numpy as np


def alpha_bar_cosine(t: np.ndarray) -> np.ndarray:
    """Cosine cumulative-alpha curve: cos((t + 0.008)/1.008 * pi/2)^2 for t in [0, 1]."""
    return np.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2


def betas_squaredcos_cap_v2(num_train_timesteps: int, max_beta: float = 0.999) -> np.ndarray:
    """Per-step betas for the cosine schedule, capped at ``max_beta``.

    Computed on host in float64 then cast to float32, matching the
    reference's numerics (it builds betas in fp32 from fp64 math).
    """
    t = np.arange(num_train_timesteps, dtype=np.float64)
    t1 = t / num_train_timesteps
    t2 = (t + 1) / num_train_timesteps
    betas = 1.0 - alpha_bar_cosine(t2) / alpha_bar_cosine(t1)
    return np.minimum(betas, max_beta).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Immutable schedule tables + options, shared by training and sampling.

    Attributes
    ----------
    alphas_cumprod : jnp.ndarray
        (num_train_timesteps,) cumulative product of (1 - beta).
    num_train_timesteps : int
        Length of the training discretization (1000 in SAiD).
    prediction_type : str
        "epsilon" | "sample" | "v_prediction".
    clip_sample : bool
        Clamp the predicted x0 to [-clip_sample_range, +clip_sample_range]
        inside each DDIM step.
    """

    alphas_cumprod: jnp.ndarray
    num_train_timesteps: int = 1000
    prediction_type: str = "epsilon"
    clip_sample: bool = True
    clip_sample_range: float = 1.0
    final_alpha_cumprod: float = 1.0  # set_alpha_to_one=True
    init_noise_sigma: float = 1.0

    @classmethod
    def create(
        cls,
        num_train_timesteps: int = 1000,
        prediction_type: str = "epsilon",
        clip_sample: bool = True,
    ) -> "DiffusionSchedule":
        if prediction_type not in ("epsilon", "sample", "v_prediction"):
            raise ValueError(f"unknown prediction_type: {prediction_type}")
        betas = betas_squaredcos_cap_v2(num_train_timesteps)
        alphas_cumprod = np.cumprod(1.0 - betas, dtype=np.float32)
        return cls(
            alphas_cumprod=jnp.asarray(alphas_cumprod),
            num_train_timesteps=num_train_timesteps,
            prediction_type=prediction_type,
            clip_sample=clip_sample,
        )

    # ---------------------------------------------------------------- train

    def add_noise(
        self, sample: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray
    ) -> jnp.ndarray:
        """Forward-process q(x_t | x_0): sqrt(a_t) x0 + sqrt(1 - a_t) eps."""
        a = self.alphas_cumprod[timesteps].astype(sample.dtype)
        a = _left_broadcast(a, sample.ndim)
        return jnp.sqrt(a) * sample + jnp.sqrt(1.0 - a) * noise

    def get_velocity(
        self, sample: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray
    ) -> jnp.ndarray:
        """v-prediction target: sqrt(a_t) eps - sqrt(1 - a_t) x0."""
        a = self.alphas_cumprod[timesteps].astype(sample.dtype)
        a = _left_broadcast(a, sample.ndim)
        return jnp.sqrt(a) * noise - jnp.sqrt(1.0 - a) * sample

    def pred_original_sample(
        self, noisy: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray
    ) -> jnp.ndarray:
        """Recover x0 from (x_t, eps) — reference ``SAID.pred_original_sample``."""
        a = self.alphas_cumprod[timesteps].astype(noisy.dtype)
        a = _left_broadcast(a, noisy.ndim)
        return (noisy - jnp.sqrt(1.0 - a) * noise) / jnp.sqrt(a)


def _left_broadcast(x: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Reshape (B,) → (B, 1, ..., 1) with ``ndim`` total dims."""
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


def inference_timesteps(num_train_timesteps: int, num_inference_steps: int) -> np.ndarray:
    """DDIM timestep grid, "leading" spacing: round(arange(n) * (T // n)) reversed."""
    step_ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].copy()
    return ts.astype(np.int64)


def ddim_step(
    schedule: DiffusionSchedule,
    model_output: jnp.ndarray,
    timestep: jnp.ndarray,
    sample: jnp.ndarray,
    num_inference_steps: int,
    eta: float = 0.0,
    noise: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """One reverse DDIM update x_t → x_{t_prev}.

    ``timestep`` may be traced (scalar int array), so this is scan-safe.
    When ``eta > 0`` a ``noise`` array of the sample's shape must be given.
    """
    t = timestep
    prev_t = t - schedule.num_train_timesteps // num_inference_steps

    acp = schedule.alphas_cumprod
    alpha_t = acp[t]
    alpha_prev = jnp.where(
        prev_t >= 0, acp[jnp.maximum(prev_t, 0)], schedule.final_alpha_cumprod
    )
    alpha_t = alpha_t.astype(sample.dtype)
    alpha_prev = alpha_prev.astype(sample.dtype)
    beta_t = 1.0 - alpha_t

    pt = schedule.prediction_type
    if pt == "epsilon":
        x0 = (sample - jnp.sqrt(beta_t) * model_output) / jnp.sqrt(alpha_t)
        eps = model_output
    elif pt == "sample":
        x0 = model_output
        eps = (sample - jnp.sqrt(alpha_t) * x0) / jnp.sqrt(beta_t)
    elif pt == "v_prediction":
        x0 = jnp.sqrt(alpha_t) * sample - jnp.sqrt(beta_t) * model_output
        eps = jnp.sqrt(alpha_t) * model_output + jnp.sqrt(beta_t) * sample
    else:  # pragma: no cover - guarded in create()
        raise ValueError(pt)

    if schedule.clip_sample:
        r = schedule.clip_sample_range
        x0 = jnp.clip(x0, -r, r)

    variance = (1.0 - alpha_prev) / (1.0 - alpha_t) * (1.0 - alpha_t / alpha_prev)
    std_dev_t = eta * jnp.sqrt(variance)

    direction = jnp.sqrt(1.0 - alpha_prev - std_dev_t**2) * eps
    prev_sample = jnp.sqrt(alpha_prev) * x0 + direction

    if eta > 0:
        if noise is None:
            raise ValueError("eta > 0 requires a noise array")
        prev_sample = prev_sample + std_dev_t * noise

    return prev_sample


def pred_x0_from_model_output(
    schedule: DiffusionSchedule,
    model_output: jnp.ndarray,
    alpha_t: jnp.ndarray,
    sample: jnp.ndarray,
) -> jnp.ndarray:
    """Convert a model output into the predicted clean sample x0.

    Same prediction-type conversions (and clip) as ``ddim_step``;
    ``alpha_t`` is the (traced) scalar cumulative alpha at the current
    timestep, already cast to the sample dtype.
    """
    beta_t = 1.0 - alpha_t
    pt = schedule.prediction_type
    if pt == "epsilon":
        x0 = (sample - jnp.sqrt(beta_t) * model_output) / jnp.sqrt(alpha_t)
    elif pt == "sample":
        x0 = model_output
    elif pt == "v_prediction":
        x0 = jnp.sqrt(alpha_t) * sample - jnp.sqrt(beta_t) * model_output
    else:  # pragma: no cover - guarded in create()
        raise ValueError(pt)
    if schedule.clip_sample:
        r = schedule.clip_sample_range
        x0 = jnp.clip(x0, -r, r)
    return x0


def dpmpp_2m_tables(
    schedule: DiffusionSchedule,
    ts_used: np.ndarray,
    num_inference_steps: int,
) -> dict:
    """Per-step coefficient tables for DPM-Solver++(2M), data-prediction
    multistep (Lu et al. 2022, arXiv:2211.01095 — a capability beyond
    the reference, whose sampler is DDIM only,
    ``said/model/diffusion.py:100-104,441-443``).

    The update from the current step s0 to the target (previous) step t:

        x_t = (sigma_t / sigma_s0) x
              - alpha_t (e^{-h} - 1) [ D0 + 1/(2 r0) (D0 - D1_prev) ]

    with lambda = log(alpha/sigma), h = lambda_t - lambda_s0,
    h0 = lambda_s0 - lambda_s1, r0 = h0/h, D0 = x0(s0), D1_prev = x0(s1).
    Because the timestep grid is static, every coefficient is a host
    float64 scalar per step — the scan body stays branch-free:

        new = c_x * x + c_d0 * x0 + (1 - first) * c_d1 * (x0 - prev_x0)

    ``first`` marks first-order steps: the chain start (no x0 history)
    and the final boundary step (sigma_t = 0 under set_alpha_to_one
    makes h infinite; the first-order update there is exact: x = x0 —
    the same boundary handling diffusers' ``lower_order_final`` /
    sigma-zero special case performs).
    """
    acp = np.asarray(schedule.alphas_cumprod, np.float64)
    ts = np.asarray(ts_used, np.int64)
    step = schedule.num_train_timesteps // num_inference_steps
    prev = ts - step
    a_cur = acp[ts]
    a_prev = np.where(
        prev >= 0, acp[np.maximum(prev, 0)], float(schedule.final_alpha_cumprod)
    )
    alpha_c, sigma_c = np.sqrt(a_cur), np.sqrt(1.0 - a_cur)
    alpha_p, sigma_p = np.sqrt(a_prev), np.sqrt(1.0 - a_prev)
    with np.errstate(divide="ignore"):
        lam_c = np.log(alpha_c) - np.log(sigma_c)
        lam_p = np.log(alpha_p) - np.log(sigma_p)  # +inf where sigma_p == 0
    h = lam_p - lam_c
    k = len(ts)
    first = np.zeros(k)
    first[0] = 1.0
    first[~np.isfinite(h)] = 1.0  # sigma_t = 0 boundary: exact 1st order

    c_x = np.where(sigma_c > 0, sigma_p / np.maximum(sigma_c, 1e-300), 0.0)
    # exp(-h) - 1; at h = inf this is exactly -1 (the x = x0 boundary)
    phi = np.where(np.isfinite(h), np.expm1(-np.where(np.isfinite(h), h, 0.0)), -1.0)
    c_d0 = -alpha_p * phi

    h0 = np.zeros(k)
    h0[1:] = lam_c[1:] - lam_c[:-1]
    safe_h = np.where((first > 0) | ~np.isfinite(h), 1.0, h)
    r0 = h0 / safe_h
    c_d1 = np.where(first > 0, 0.0, -0.5 * alpha_p * phi / np.maximum(r0, 1e-300))

    f32 = lambda x: jnp.asarray(x, jnp.float32)  # noqa: E731
    return {
        "c_x": f32(c_x),
        "c_d0": f32(c_d0),
        "c_d1": f32(c_d1),
        "first": f32(first),
    }


def rescale_noise_cfg(
    noise_cfg: jnp.ndarray, noise_pred_text: jnp.ndarray, guidance_rescale: float
) -> jnp.ndarray:
    """CFG rescale (Lin et al., "Common Diffusion Noise Schedules..."), matching
    the helper the reference imports from its diffusion library.

    Uses the unbiased (ddof=1) std over all non-batch axes, as torch does.
    """
    axes = tuple(range(1, noise_pred_text.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True, ddof=1)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True, ddof=1)
    rescaled = noise_cfg * (std_text / std_cfg)
    return guidance_rescale * rescaled + (1.0 - guidance_rescale) * noise_cfg


def cfg_combine(
    noise_pred_uncond: jnp.ndarray,
    noise_pred_cond: jnp.ndarray,
    guidance_scale: float,
    guidance_rescale: float = 0.0,
) -> jnp.ndarray:
    """Classifier-free guidance, with SAiD's (non-standard) combination.

    The reference combines as ``cond + s * (cond - uncond)`` — i.e. the
    effective scale is (1 + s) in the usual convention
    (``said/model/diffusion.py:430-439``).
    """
    noise_pred = noise_pred_cond + guidance_scale * (noise_pred_cond - noise_pred_uncond)
    if guidance_rescale > 0.0:
        noise_pred = rescale_noise_cfg(noise_pred, noise_pred_cond, guidance_rescale)
    return noise_pred
