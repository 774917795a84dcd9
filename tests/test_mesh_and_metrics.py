"""Mesh I/O round-trips, submesh extraction, and metric sanity/golden tests."""

import numpy as np
import pytest

from said_tpu.eval.metrics import (
    StatisticGMM,
    frechet_distance,
    get_statistic,
    multimodality,
    wind,
)
from said_tpu.utils.mesh import Mesh, create_mesh, get_submesh, load_mesh, save_mesh


@pytest.fixture
def cube():
    vertices = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
         [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], dtype=np.float64
    )
    faces = np.array(
        [[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6],
         [0, 4, 5], [0, 5, 1], [2, 6, 7], [2, 7, 3],
         [1, 5, 6], [1, 6, 2], [0, 3, 7], [0, 7, 4]]
    )
    return Mesh(vertices=vertices, faces=faces)


@pytest.mark.parametrize("ext", ["obj", "ply"])
def test_mesh_round_trip(cube, tmp_path, ext):
    path = str(tmp_path / f"cube.{ext}")
    save_mesh(cube, path)
    loaded = load_mesh(path)
    np.testing.assert_allclose(loaded.vertices, cube.vertices, atol=1e-6)
    np.testing.assert_array_equal(loaded.faces, cube.faces)


def test_ascii_ply(tmp_path, cube):
    path = str(tmp_path / "cube_ascii.ply")
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(cube.vertices)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(cube.faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in cube.vertices:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for fc in cube.faces:
            f.write(f"3 {fc[0]} {fc[1]} {fc[2]}\n")
    loaded = load_mesh(path)
    np.testing.assert_allclose(loaded.vertices, cube.vertices)
    np.testing.assert_array_equal(loaded.faces, cube.faces)


def test_submesh(cube):
    sub = get_submesh(cube.vertices, cube.faces, [0, 1, 2, 3])
    np.testing.assert_allclose(sub.vertices, cube.vertices[:4])
    # only the two bottom faces survive, remapped
    assert sub.faces.shape == (2, 3)
    np.testing.assert_array_equal(sub.faces, [[0, 1, 2], [0, 2, 3]])


# ------------------------------------------------------------------ metrics


def test_frechet_distance_identical_is_zero():
    rng = np.random.default_rng(0)
    data = [rng.standard_normal(8) for _ in range(200)]
    s = get_statistic(data)
    assert abs(frechet_distance(s.mean, s.cov, s.mean, s.cov)) < 1e-6


def test_frechet_distance_mean_shift_golden():
    """For equal covariances, FD = ||μ1 - μ2||²."""
    d = 6
    cov = np.eye(d) * 0.5
    mu1 = np.zeros(d)
    mu2 = np.full(d, 0.3)
    fd = frechet_distance(mu1, cov, mu2, cov)
    assert abs(fd - d * 0.3**2) < 1e-8


def test_frechet_distance_1d_closed_form():
    """1-D Gaussians: FD = (μ1-μ2)² + (σ1-σ2)²."""
    fd = frechet_distance(np.array([1.0]), np.array([[4.0]]),
                          np.array([3.0]), np.array([[9.0]]))
    assert abs(fd - (4.0 + 1.0)) < 1e-8


def test_wind_identical_gmms_is_zero():
    rng = np.random.default_rng(1)
    stats = [
        StatisticGMM(mean=rng.standard_normal(4), cov=np.eye(4), weight=0.5),
        StatisticGMM(mean=rng.standard_normal(4), cov=np.eye(4), weight=0.5),
    ]
    assert abs(wind(stats, stats)) < 1e-8


def test_wind_two_point_transport():
    """Two single-component GMMs: WInD = FD between the components."""
    a = [StatisticGMM(mean=np.zeros(3), cov=np.eye(3), weight=1.0)]
    b = [StatisticGMM(mean=np.ones(3), cov=np.eye(3), weight=1.0)]
    expected = frechet_distance(a[0].mean, a[0].cov, b[0].mean, b[0].cov)
    assert abs(wind(a, b) - expected) < 1e-8


def test_multimodality():
    a = [np.zeros(4), np.zeros(4)]
    b = [np.full(4, 1.0), np.full(4, 2.0)]
    # L2 norms: 2 and 4 → mean 3
    assert abs(multimodality(a, b) - 3.0) < 1e-8
    assert multimodality([], []) == 0.0
