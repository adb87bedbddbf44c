"""Torch->JAX weight converter parity tests.

Random-weight torch modules are built with the *reference's* parameter
naming (VPoser: bodyprior_*; CVAE scene encoder: resnet.N Sequential
renumbering), converted, and required to produce near-bit-equal
outputs from the flax models. This pins every layout convention
(Linear/Conv transposes, BN stats, NCHW->NHWC flatten permutation) so
real reference checkpoints transplant exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

from psi_tpu.body.vposer import VPoser
from psi_tpu.models.scene_encoder import SceneEncoder
from psi_tpu.utils.convert_torch import (
    convert_scene_encoder,
    convert_vposer_state_dict,
)


# ---------------------------------------------------------------------------
# VPoser
# ---------------------------------------------------------------------------


class _TorchVPoser(tnn.Module):
    """Reference-named VPoser (vposer_smpl.py:65-121), decode-to-matrot."""

    def __init__(self, nf=63, nn_=512, latentD=32, nj=21):
        super().__init__()
        self.bodyprior_enc_bn1 = tnn.BatchNorm1d(nf)
        self.bodyprior_enc_fc1 = tnn.Linear(nf, nn_)
        self.bodyprior_enc_bn2 = tnn.BatchNorm1d(nn_)
        self.bodyprior_enc_fc2 = tnn.Linear(nn_, nn_)
        self.bodyprior_enc_mu = tnn.Linear(nn_, latentD)
        self.bodyprior_enc_logvar = tnn.Linear(nn_, latentD)
        self.bodyprior_dec_fc1 = tnn.Linear(latentD, nn_)
        self.bodyprior_dec_fc2 = tnn.Linear(nn_, nn_)
        self.bodyprior_dec_out = tnn.Linear(nn_, nj * 6)
        self.nj = nj

    def encode(self, x):
        x = self.bodyprior_enc_bn1(x)
        x = tF.leaky_relu(self.bodyprior_enc_fc1(x), 0.2)
        x = self.bodyprior_enc_bn2(x)
        x = tF.leaky_relu(self.bodyprior_enc_fc2(x), 0.2)
        return self.bodyprior_enc_mu(x), tF.softplus(self.bodyprior_enc_logvar(x))

    def decode_matrot(self, z):
        x = tF.leaky_relu(self.bodyprior_dec_fc1(z), 0.2)
        x = tF.leaky_relu(self.bodyprior_dec_fc2(x), 0.2)
        x6 = self.bodyprior_dec_out(x).view(-1, 3, 2)
        b1 = tF.normalize(x6[:, :, 0], dim=1)
        dot = (b1 * x6[:, :, 1]).sum(1, keepdim=True)
        b2 = tF.normalize(x6[:, :, 1] - dot * b1, dim=-1)
        b3 = torch.cross(b1, b2, dim=1)
        return torch.stack([b1, b2, b3], dim=-1).view(z.shape[0], self.nj, 3, 3)


def test_vposer_converter_parity(rng):
    tm = _TorchVPoser().eval()
    # randomize running stats so BN conversion is actually exercised
    with torch.no_grad():
        tm.bodyprior_enc_bn1.running_mean.normal_(0, 0.3)
        tm.bodyprior_enc_bn1.running_var.uniform_(0.5, 2.0)
        tm.bodyprior_enc_bn2.running_mean.normal_(0, 0.3)
        tm.bodyprior_enc_bn2.running_var.uniform_(0.5, 2.0)

    variables = convert_vposer_state_dict(tm.state_dict())
    variables = jax.tree.map(jnp.asarray, variables)
    mdl = VPoser()

    z = rng.normal(size=(4, 32)).astype(np.float32)
    R_j = mdl.apply(variables, jnp.asarray(z), method=VPoser.decode_matrot)
    with torch.no_grad():
        R_t = tm.decode_matrot(torch.tensor(z))
    np.testing.assert_allclose(np.asarray(R_j), R_t.numpy(), atol=2e-5)

    pose = (rng.normal(size=(4, 63)) * 0.4).astype(np.float32)
    mu_j, std_j = mdl.apply(variables, jnp.asarray(pose), method=VPoser.encode)
    with torch.no_grad():
        mu_t, std_t = tm.encode(torch.tensor(pose))
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(std_j), std_t.numpy(), atol=2e-5)


# ---------------------------------------------------------------------------
# Scene encoder (2-ch stem + truncated resnet18 + conv + fc)
# ---------------------------------------------------------------------------


class _TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = tF.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return tF.relu(y + idt)


class _TorchSceneEncoder(tnn.Module):
    """Reference scene encoder structure (cvae.py:427-437): the Sequential
    renumbering makes keys resnet.0 (stem) .. resnet.5 (layer2)."""

    def __init__(self, f_dim=32, num_hidden=64):
        super().__init__()
        self.resnet = tnn.Sequential(
            tnn.Conv2d(2, 64, 7, 2, 3, bias=False),
            tnn.BatchNorm2d(64),
            tnn.ReLU(),
            tnn.MaxPool2d(3, 2, 1),
            tnn.Sequential(_TorchBasicBlock(64, 64), _TorchBasicBlock(64, 64)),
            tnn.Sequential(_TorchBasicBlock(64, 128, 2), _TorchBasicBlock(128, 128)),
        )
        self.conv = tnn.Conv2d(128, f_dim, 3, 1, 1)
        self.fc = tnn.Linear(f_dim * 16 * 16, num_hidden)

    def forward(self, x):
        b = x.shape[0]
        z = self.conv(self.resnet(x))
        return self.fc(z.view(b, -1))


def _randomize_bn_stats(m):
    for mod in m.modules():
        if isinstance(mod, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
            with torch.no_grad():
                mod.running_mean.normal_(0, 0.2)
                mod.running_var.uniform_(0.5, 2.0)


def test_scene_encoder_converter_parity(rng):
    tm = _TorchSceneEncoder().eval()
    _randomize_bn_stats(tm)

    variables = convert_scene_encoder(tm.state_dict(), "", f_dim=32)
    variables = jax.tree.map(jnp.asarray, variables)
    mdl = SceneEncoder(f_dim=32, num_hidden=64)

    x = rng.normal(size=(2, 2, 128, 128)).astype(np.float32)  # NCHW for torch
    with torch.no_grad():
        out_t = tm(torch.tensor(x)).numpy()
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    out_j = mdl.apply(variables, x_nhwc, False)
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=5e-4)
