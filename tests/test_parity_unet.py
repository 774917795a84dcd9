"""End-to-end parity: JAX UNet1D vs the reference torch denoiser.

Instantiates the reference's own ``UNet1DConditionModel`` (torch, CPU),
exports its random-initialized state dict, imports it into the flax
model via ``convert_unet1d``, and compares outputs on shared inputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from said_tpu.models.unet1d import UNet1DConditionModel
from said_tpu.utils.torch_import import convert_unet1d


@pytest.fixture(scope="module")
def torch_unet(reference_on_path):
    from said.model.unet_1d_condition import UNet1DConditionModel as TorchUNet

    torch.manual_seed(0)
    m = TorchUNet(in_channels=32, out_channels=32, cross_attention_dim=768)
    m.eval()
    return m


@pytest.fixture(scope="module")
def shared_inputs():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 45, 32)).astype(np.float32)
    t = np.array([10, 500], dtype=np.int64)
    ctx = rng.standard_normal((2, 45, 768)).astype(np.float32)
    return x, t, ctx


@pytest.fixture(scope="module")
def torch_output(torch_unet, shared_inputs):
    x, t, ctx = shared_inputs
    with torch.no_grad():
        out = torch_unet(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(ctx)
        )
    return out.numpy()


@pytest.mark.parametrize("cross_impl", ["banded", "dense"])
def test_unet_forward_parity(torch_unet, shared_inputs, torch_output, cross_impl):
    x, t, ctx = shared_inputs
    sd = {k: v.detach().numpy() for k, v in torch_unet.state_dict().items()}
    params = convert_unet1d(sd, prefix="model.")

    model = UNet1DConditionModel(cross_attn_impl=cross_impl)
    out = model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)
    )
    np.testing.assert_allclose(np.asarray(out), torch_output, atol=2e-5, rtol=1e-4)


def test_unet_scalar_timestep(torch_unet, shared_inputs):
    """Scalar timestep broadcasts to the batch, as the reference does."""
    x, _, ctx = shared_inputs
    sd = {k: v.detach().numpy() for k, v in torch_unet.state_dict().items()}
    params = convert_unet1d(sd, prefix="model.")
    with torch.no_grad():
        t_out = torch_unet(
            torch.from_numpy(x),
            torch.tensor([700, 700], dtype=torch.long),
            torch.from_numpy(ctx),
        ).numpy()
    model = UNet1DConditionModel()
    out = model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(700), jnp.asarray(ctx)
    )
    np.testing.assert_allclose(np.asarray(out), t_out, atol=2e-5, rtol=1e-4)
