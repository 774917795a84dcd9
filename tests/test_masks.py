"""Alignment-band mask: closed form vs the reference's per-forward loop."""

import numpy as np
import pytest

from said_tpu.ops.masks import alignment_band, alignment_bias_mask, band_gather_indices


def _reference_loop_mask(x_seq_len, c_seq_len, pad=1):
    """The reference algorithm (said/model/ldm/attention.py:170-191),
    re-expressed: True = DISALLOWED (its align_bias polarity)."""
    c_x_ratio = c_seq_len / x_seq_len
    c_kh_size = c_x_ratio / 2 + pad
    bias = np.ones((x_seq_len, c_seq_len), dtype=bool)
    for i in range(x_seq_len):
        c_mid = (i + 0.5) * c_x_ratio
        c_min = max(round(c_mid - c_kh_size), 0)
        c_max = min(round(c_mid + c_kh_size), c_seq_len)
        bias[i, c_min:c_max] = False
    return bias


@pytest.mark.parametrize(
    "x_len,c_len",
    [(120, 120), (7, 7), (100, 50), (50, 100), (120, 113), (13, 120), (317, 317), (1, 5)],
)
def test_mask_matches_reference_loop(x_len, c_len):
    ref_disallowed = _reference_loop_mask(x_len, c_len)
    ours_allowed = alignment_bias_mask(x_len, c_len)
    np.testing.assert_array_equal(ours_allowed, ~ref_disallowed)


def test_band_width_is_3_at_equal_rate():
    """SAiD interpolates audio features to the frame count → ratio 1 → band 3."""
    c_min, c_max = alignment_band(240, 240)
    widths = c_max - c_min
    assert widths.max() == 3
    idx, valid, width = band_gather_indices(240, 240)
    assert width == 3
    assert idx.shape == (240, 3)


@pytest.mark.parametrize("x_len,c_len", [(120, 120), (100, 50), (50, 100), (33, 77)])
def test_band_gather_equals_dense_mask(x_len, c_len):
    dense = alignment_bias_mask(x_len, c_len)
    idx, valid, width = band_gather_indices(x_len, c_len)
    rebuilt = np.zeros_like(dense)
    for i in range(x_len):
        for w in range(width):
            if valid[i, w]:
                rebuilt[i, idx[i, w]] = True
    np.testing.assert_array_equal(rebuilt, dense)


def test_every_row_has_an_allowed_key():
    for x_len, c_len in [(120, 120), (7, 200), (200, 7)]:
        m = alignment_bias_mask(x_len, c_len)
        assert m.any(axis=1).all()
