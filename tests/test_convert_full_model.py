"""Full HumanCVAES1 converter parity: a torch module with the reference's
exact parameter naming (cvae.py:411-455) -> convert -> our flax model
must produce near-bit-equal deterministic outputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

from psi_tpu.models import HumanCVAES1
from psi_tpu.utils.convert_torch import convert_cvae_s1_state_dict
from tests.test_convert import _TorchBasicBlock, _randomize_bn_stats


class _TorchResBlock(tnn.Module):
    def __init__(self, n):
        super().__init__()
        self.fc1 = tnn.Linear(n, n)
        self.fc2 = tnn.Linear(n, n)

    def forward(self, x0):
        x = tF.leaky_relu(self.fc1(x0), 0.01)
        x = tF.leaky_relu(self.fc2(x), 0.01)
        return x + x0


class _TorchCVAES1(tnn.Module):
    """Reference-named HumanCVAES1 (keys resnet.*, conv, fc, linear_in,
    human_encoder.N.*, mu_enc, logvar_enc, linear_latent,
    human_decoder.N.*, linear_out)."""

    def __init__(self, latentD=64, n_dim_body=75):
        super().__init__()
        self.resnet = tnn.Sequential(
            tnn.Conv2d(2, 64, 7, 2, 3, bias=False), tnn.BatchNorm2d(64), tnn.ReLU(),
            tnn.MaxPool2d(3, 2, 1),
            tnn.Sequential(_TorchBasicBlock(64, 64), _TorchBasicBlock(64, 64)),
            tnn.Sequential(_TorchBasicBlock(64, 128, 2), _TorchBasicBlock(128, 128)),
        )
        self.conv = tnn.Conv2d(128, 32, 3, 1, 1)
        self.fc = tnn.Linear(32 * 16 * 16, latentD)
        self.linear_in = tnn.Linear(n_dim_body, latentD)
        self.human_encoder = tnn.Sequential(_TorchResBlock(2 * latentD), _TorchResBlock(2 * latentD))
        self.mu_enc = tnn.Linear(2 * latentD, 32)
        self.logvar_enc = tnn.Linear(2 * latentD, 32)
        self.linear_latent = tnn.Linear(32, latentD)
        self.human_decoder = tnn.Sequential(_TorchResBlock(2 * latentD), _TorchResBlock(2 * latentD))
        self.linear_out = tnn.Linear(2 * latentD, n_dim_body)

    def encode_stats(self, x_body, x_s):
        b = x_s.shape[0]
        z_s = self.fc(self.conv(self.resnet(x_s)).view(b, -1))
        z = torch.cat([self.linear_in(x_body), z_s], 1)
        z = self.human_encoder(z)
        return self.mu_enc(z), self.logvar_enc(z), z_s

    def decode(self, eps, z_s):
        z = torch.cat([self.linear_latent(eps), z_s], 1)
        z = self.human_decoder(z)
        return self.linear_out(z)


def test_full_cvae_s1_converter_parity(rng):
    tm = _TorchCVAES1().eval()
    _randomize_bn_stats(tm)
    variables = jax.tree.map(jnp.asarray, convert_cvae_s1_state_dict(tm.state_dict()))
    mdl = HumanCVAES1(latentD=64)

    x_body = (rng.normal(size=(2, 75)) * 0.5).astype(np.float32)
    x_s = rng.normal(size=(2, 2, 128, 128)).astype(np.float32)
    eps = rng.normal(size=(2, 32)).astype(np.float32)

    with torch.no_grad():
        mu_t, lv_t, zs_t = tm.encode_stats(torch.tensor(x_body), torch.tensor(x_s))
        gen_t = tm.decode(torch.tensor(eps), zs_t)

    x_s_nhwc = jnp.asarray(np.transpose(x_s, (0, 2, 3, 1)))
    # deterministic forward (key=None -> z = mu): check mu/logvar via full fwd
    rec_j, mu_j, lv_j = mdl.apply(variables, jnp.asarray(x_body), x_s_nhwc)
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(lv_j), lv_t.numpy(), atol=1e-3)

    gen_j = mdl.apply(variables, x_s_nhwc, jnp.asarray(eps), method=HumanCVAES1.sample_with_eps)
    np.testing.assert_allclose(np.asarray(gen_j), gen_t.numpy(), atol=1e-3)
