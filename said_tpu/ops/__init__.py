"""Compute primitives: attention, masks, norms, resampling, Pallas kernels."""

from said_tpu.ops.masks import alignment_band, alignment_bias_mask, band_gather_indices
from said_tpu.ops.attention import multi_head_attention
from said_tpu.ops.norms import group_norm
from said_tpu.ops.resample import linear_interp_time

__all__ = [
    "alignment_band",
    "alignment_bias_mask",
    "band_gather_indices",
    "multi_head_attention",
    "group_norm",
    "linear_interp_time",
]
