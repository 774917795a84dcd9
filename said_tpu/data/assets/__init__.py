"""Vendored BlendVOCA/ARKit protocol data tables.

These few-KB text tables define the dataset protocol the framework
speaks (reference ``data/README.md:1-30``):

- ``ARKit_blendshapes.txt`` — the 32 ARKit blendshape names (column
  order of every coefficients CSV).
- ``ARKit_landmarks.txt`` / ``FLAME_landmarks.txt`` /
  ``FLAME_head_landmarks.txt`` — corresponding landmark vertex indices
  on the ARKit reference mesh / FLAME template / cropped FLAME head.
- ``FLAME_head_idx.txt`` — FLAME template vertex indices of the head
  submesh (the crop every BlendVOCA mesh uses).
- ``coeffs_std.csv`` — per-blendshape standard deviations of the
  pseudo-GT coefficients (the training loss's reweighting table,
  reference ``script/train.py:118-120``).

They are data, not code; vendoring them makes the framework standalone
(no reference checkout needed at runtime). CLI ``--*_path`` flags still
override every one of them.
"""

from __future__ import annotations

from importlib import resources

_ASSETS = (
    "ARKit_blendshapes.txt",
    "ARKit_landmarks.txt",
    "FLAME_head_idx.txt",
    "FLAME_head_landmarks.txt",
    "FLAME_landmarks.txt",
    "coeffs_std.csv",
)


def asset_path(name: str) -> str:
    """Absolute path of a vendored data table (see module docstring)."""
    if name not in _ASSETS:
        raise KeyError(f"unknown vendored asset {name!r}; have {_ASSETS}")
    return str(resources.files(__package__).joinpath(name))
