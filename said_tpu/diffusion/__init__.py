"""Diffusion math: schedules, DDIM stepping, CFG, and the scan-based sampler."""

from said_tpu.diffusion.schedule import (
    DiffusionSchedule,
    alpha_bar_cosine,
    betas_squaredcos_cap_v2,
    ddim_step,
    inference_timesteps,
    rescale_noise_cfg,
)
from said_tpu.diffusion.sampler import SamplerConfig, sample

__all__ = [
    "DiffusionSchedule",
    "alpha_bar_cosine",
    "betas_squaredcos_cap_v2",
    "ddim_step",
    "inference_timesteps",
    "rescale_noise_cfg",
    "SamplerConfig",
    "sample",
]
