"""Renderer + AVI muxer: geometry sanity and file-structure checks."""

import struct

import numpy as np
import pytest

from said_tpu.render.rasterizer import Renderer, render_blendshape_coefficients
from said_tpu.render.video import write_mjpeg_avi
from said_tpu.utils.mesh import Mesh


@pytest.fixture(scope="module")
def face_like_mesh():
    """A small subdivided plane facing the camera at z=0 (head scale)."""
    n = 12
    g = np.linspace(-0.08, 0.08, n)
    gx, gy = np.meshgrid(g, g)
    vertices = np.stack([gx.ravel(), gy.ravel(), np.zeros(n * n)], axis=1)
    faces = []
    for r in range(n - 1):
        for c in range(n - 1):
            i = r * n + c
            faces.append([i, i + 1, i + n])
            faces.append([i + 1, i + n + 1, i + n])
    return Mesh(vertices=vertices, faces=np.asarray(faces))


def test_renders_nonempty_centered_image(face_like_mesh):
    r = Renderer(width=200, height=200)
    # scale intrinsics down with the viewport
    r.fx = r.fy = r.fx * 200 / 800
    img = r.render(face_like_mesh, face_like_mesh.vertices.mean(axis=0))
    assert img.shape == (200, 200, 3)
    assert img.max() > 0  # something was drawn
    # the mesh is centered: center pixel should be lit, corners black
    assert img[100, 100].sum() > 0
    assert img[5, 5].sum() == 0


def test_render_blendshape_sequence(face_like_mesh):
    r = Renderer(width=100, height=100)
    r.fx = r.fy = r.fx * 100 / 800
    neutral_vec = face_like_mesh.vertices.reshape(-1, 1)
    # 2 fake blendshapes: push z, push x
    b1 = neutral_vec + 0.01
    b2 = neutral_vec - 0.01
    matrix = np.concatenate([b1, b2], axis=1)
    coeffs = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    frames = render_blendshape_coefficients(r, face_like_mesh, matrix, coeffs)
    assert len(frames) == 3
    assert all(f.shape == (100, 100, 3) for f in frames)
    # heatmap mode
    frames_hm = render_blendshape_coefficients(
        r, face_like_mesh, matrix, coeffs, target_blendshape_coeffs=coeffs * 0.5
    )
    assert len(frames_hm) == 3


def test_avi_structure(tmp_path):
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (32, 48, 3), dtype=np.uint8) for _ in range(5)]
    audio = rng.uniform(-0.5, 0.5, 16000 // 12).astype(np.float32)
    path = str(tmp_path / "t.avi")
    write_mjpeg_avi(path, frames, fps=60, audio=audio, sample_rate=16000)

    with open(path, "rb") as f:
        data = f.read()
    assert data[:4] == b"RIFF"
    assert data[8:12] == b"AVI "
    riff_size = struct.unpack("<I", data[4:8])[0]
    assert riff_size == len(data) - 8
    assert b"movi" in data and b"idx1" in data
    assert data.count(b"00dc") >= 5  # ≥ one video chunk per frame (idx1 repeats ids)
    assert b"01wb" in data  # audio present
    assert b"MJPG" in data
