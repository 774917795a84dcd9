"""Parity: flax BCVAE vs the reference torch BCVAE with the REAL
pretrained evaluation weights (``/root/reference/model/vae.pth``)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from said_tpu.models.vae import BCVAE
from said_tpu.utils.torch_import import convert_bcvae, load_state_dict


@pytest.fixture(scope="module")
def vae_pth(reference_root):
    p = reference_root / "model" / "vae.pth"
    if not p.exists():
        pytest.skip("vae.pth not in checkout")
    return str(p)


@pytest.fixture(scope="module")
def torch_vae(reference_on_path, vae_pth):
    from said.model.vae import BCVAE as TorchBCVAE

    m = TorchBCVAE()
    m.load_state_dict(torch.load(vae_pth, map_location="cpu"))
    m.eval()
    return m


@pytest.fixture(scope="module")
def coeffs():
    rng = np.random.default_rng(7)
    return rng.uniform(0, 1, (3, 120, 32)).astype(np.float32)


def test_vae_encode_parity(torch_vae, vae_pth, coeffs):
    params, batch_stats = convert_bcvae(load_state_dict(vae_pth))
    model = BCVAE()

    with torch.no_grad():
        t_latent = torch_vae.encode(torch.from_numpy(coeffs))
    mean_t, logvar_t = t_latent.mean.numpy(), t_latent.log_var.numpy()

    mean_j, logvar_j = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(coeffs),
        method=BCVAE.encode,
    )
    np.testing.assert_allclose(np.asarray(mean_j), mean_t, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(logvar_j), logvar_t, atol=1e-4, rtol=1e-3)


def test_vae_full_reconstruction_parity(torch_vae, vae_pth, coeffs):
    """use_noise=False end-to-end: encode → mean → decode."""
    params, batch_stats = convert_bcvae(load_state_dict(vae_pth))
    model = BCVAE()

    with torch.no_grad():
        t_out = torch_vae(torch.from_numpy(coeffs), use_noise=False)
    reconst_t = t_out.coeffs_reconst.numpy()

    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(coeffs),
        use_noise=False,
    )
    np.testing.assert_allclose(
        np.asarray(out.coeffs_reconst), reconst_t, atol=1e-4, rtol=1e-3
    )
    # The eval protocol uses the encoder mean as the latent.
    np.testing.assert_allclose(
        np.asarray(out.mean), t_out.mean.numpy(), atol=1e-4, rtol=1e-3
    )
