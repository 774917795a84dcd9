"""Test configuration: force CPU with 8 virtual devices.

NOTE: on this jax build the JAX_PLATFORMS / XLA_FLAGS env vars are NOT
honored (the TPU plugin registers regardless); only config updates work,
so everything is set through jax.config before first backend use.
"""

import os
import pathlib
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# jax's default matmul/conv precision allows reduced (bf16-class)
# accumulation; parity tests compare against torch fp32.
jax.config.update("jax_default_matmul_precision", "highest")

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
REFERENCE_ROOT = pathlib.Path("/root/reference")

sys.path.insert(0, str(REPO_ROOT))


def has_reference() -> bool:
    return REFERENCE_ROOT.exists()


@pytest.fixture(scope="session")
def reference_root() -> pathlib.Path:
    if not has_reference():
        pytest.skip("reference checkout not available")
    return REFERENCE_ROOT


def _stub_module(name: str, **attrs):
    """Register a minimal fake module so the reference package imports."""
    import importlib.machinery
    import types

    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    # register in parent, too
    if "." in name:
        parent_name, child = name.rsplit(".", 1)
        parent = sys.modules.get(parent_name)
        if parent is not None:
            setattr(parent, child, mod)
    return mod


@pytest.fixture(scope="session")
def reference_on_path(reference_root):
    """Make the reference's `said` package importable for parity tests.

    The reference package eagerly imports third-party deps that are not
    installed here (librosa, torchaudio, trimesh, qpsolvers, cvxopt,
    pytorch_fid, diffusers); stub just enough for import to succeed —
    parity tests only exercise torch/transformers-backed modules.
    """
    _stub_module("librosa")
    _stub_module("librosa.onset", onset_detect=lambda **kw: None)
    _stub_module("torchaudio", load=None)
    _stub_module("torchaudio.functional", resample=None)
    _stub_module("trimesh", Trimesh=object)
    _stub_module("trimesh.base", Trimesh=object)
    _stub_module("qpsolvers", solve_qp=None)
    _stub_module("cvxopt", matrix=None, solvers=None, spmatrix=None)
    _stub_module("pytorch_fid")
    _stub_module("pytorch_fid.fid_score", calculate_frechet_distance=None)
    _stub_module("diffusers", DDIMScheduler=object, SchedulerMixin=object)
    _stub_module("diffusers.pipelines")
    _stub_module("diffusers.pipelines.stable_diffusion")
    _stub_module(
        "diffusers.pipelines.stable_diffusion.pipeline_stable_diffusion",
        rescale_noise_cfg=None,
    )
    _stub_module("diffusers.optimization", get_scheduler=None)
    _stub_module("diffusers.training_utils", EMAModel=object)

    p = str(reference_root)
    if p not in sys.path:
        sys.path.insert(0, p)
    return reference_root
