"""Blendshape-coefficient I/O — identical CSV schema to the reference.

CSV: header row = 32 ARKit blendshape names; one row per 60 fps frame;
values in [0, 1] (``said/util/blendshape.py:36-70``). The Blender
add-on consumes exactly this format, so it interoperates unchanged.
"""

from __future__ import annotations

import pickle
from typing import Dict, List

import numpy as np
import pandas as pd


def load_blendshape_deltas(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """{person_id: {blendshape_name: (|V|, 3) delta}} pickle loader."""
    with open(path, "rb") as f:
        return pickle.load(f)


def load_blendshape_coeffs(coeffs_path: str) -> np.ndarray:
    """CSV → (T, num_classes) float32 array."""
    df = pd.read_csv(coeffs_path)
    return df.values.astype(np.float32)


def load_blendshape_coeffs_columns(coeffs_path: str):
    """CSV → ((T, C) float32, column names)."""
    df = pd.read_csv(coeffs_path)
    return df.values.astype(np.float32), list(df.columns)


def save_blendshape_coeffs(
    coeffs: np.ndarray, classes: List[str], output_path: str
) -> None:
    """(T, C) array → CSV with the class-name header."""
    pd.DataFrame(np.asarray(coeffs), columns=classes).to_csv(output_path, index=False)


def save_blendshape_coeffs_image(coeffs: np.ndarray, output_path: str) -> None:
    """(T, C) coefficients → grayscale PNG (classes × frames)."""
    from PIL import Image

    orig = (255 * np.asarray(coeffs).T).round()
    Image.fromarray(orig).convert("L").save(output_path)
