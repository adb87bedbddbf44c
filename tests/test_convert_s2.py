"""HumanCVAES2 converter parity: reference-named torch sub-VAEs
(net_layers.py:47-234 naming under trans_vae./pose_vae. prefixes) ->
flax HumanCVAES2 with near-bit-equal deterministic outputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

from psi_tpu.models import HumanCVAES2
from psi_tpu.utils.convert_torch import convert_cvae_s2_state_dict
from tests.test_convert import _TorchBasicBlock, _randomize_bn_stats
from tests.test_convert_full_model import _TorchResBlock


def _torch_scene(f_dim):
    return (
        tnn.Sequential(
            tnn.Conv2d(2, 64, 7, 2, 3, bias=False), tnn.BatchNorm2d(64), tnn.ReLU(),
            tnn.MaxPool2d(3, 2, 1),
            tnn.Sequential(_TorchBasicBlock(64, 64), _TorchBasicBlock(64, 64)),
            tnn.Sequential(_TorchBasicBlock(64, 128, 2), _TorchBasicBlock(128, 128)),
        ),
        tnn.Conv2d(128, f_dim, 3, 1, 1),
    )


class _TorchGlobalVAE(tnn.Module):
    def __init__(self, nh=64, zdim=32, f_dim=32):
        super().__init__()
        self.resnet, self.conv = _torch_scene(f_dim)
        self.fc = tnn.Linear(f_dim * 16 * 16, nh)
        self.torso_linear = tnn.Linear(3, nh)
        self.encode = tnn.Sequential(_TorchResBlock(2 * nh), _TorchResBlock(2 * nh))
        self.mean_linear = tnn.Linear(2 * nh, zdim)
        self.log_var_linear = tnn.Linear(2 * nh, zdim)
        self.decode = tnn.Sequential(
            tnn.Linear(nh + zdim, f_dim), _TorchResBlock(f_dim), _TorchResBlock(f_dim), tnn.Linear(f_dim, 3)
        )

    def stats(self, scene, torso):
        b = scene.shape[0]
        z_s = self.fc(self.conv(self.resnet(scene)).view(b, -1))
        f = self.encode(torch.cat([z_s, self.torso_linear(torso)], 1))
        return self.mean_linear(f), self.log_var_linear(f), z_s


class _TorchLocalVAE(tnn.Module):
    def __init__(self, nh=64, zdim=32, f_dim=128):
        super().__init__()
        self.resnet, self.conv = _torch_scene(f_dim)
        self.fc = tnn.Linear(f_dim * 16 * 16, nh)
        self.torso_linear = tnn.Linear(3, nh)
        self.pose_linear = tnn.Linear(72, nh)
        self.encode = tnn.Sequential(_TorchResBlock(3 * nh), _TorchResBlock(3 * nh))
        self.mean_linear = tnn.Linear(3 * nh, zdim)
        self.log_var_linear = tnn.Linear(3 * nh, zdim)
        self.decode = tnn.Sequential(
            tnn.Linear(2 * nh + zdim, f_dim), _TorchResBlock(f_dim), _TorchResBlock(f_dim), tnn.Linear(f_dim, 72)
        )

    def stats(self, scene, torso, pose):
        b = scene.shape[0]
        z_s = self.fc(self.conv(self.resnet(scene)).view(b, -1))
        z_g = self.torso_linear(torso)
        f = self.encode(torch.cat([self.pose_linear(pose), z_g, z_s], 1))
        return self.mean_linear(f), self.log_var_linear(f)


class _TorchCVAES2(tnn.Module):
    def __init__(self):
        super().__init__()
        self.trans_vae = _TorchGlobalVAE()
        self.pose_vae = _TorchLocalVAE()


def test_cvae_s2_converter_parity(rng):
    tm = _TorchCVAES2().eval()
    _randomize_bn_stats(tm)
    variables = jax.tree.map(jnp.asarray, convert_cvae_s2_state_dict(tm.state_dict()))
    mdl = HumanCVAES2(latentD_g=64, latentD_l=64)

    x_body = (rng.normal(size=(2, 75)) * 0.5).astype(np.float32)
    x_s = rng.normal(size=(2, 2, 128, 128)).astype(np.float32)

    with torch.no_grad():
        mu_g_t, lv_g_t, zs_t = tm.trans_vae.stats(torch.tensor(x_s), torch.tensor(x_body[:, :3]))
        # deterministic z = mu_g; decode global; then local stats on that rec
        zg = torch.cat([mu_g_t, zs_t], 1)
        x_g_rec_t = tm.trans_vae.decode(zg)
        mu_l_t, lv_l_t = tm.pose_vae.stats(torch.tensor(x_s), x_g_rec_t, torch.tensor(x_body[:, 3:]))

    x_s_nhwc = jnp.asarray(np.transpose(x_s, (0, 2, 3, 1)))
    rec_j, mu_g_j, lv_g_j, mu_l_j, lv_l_j = mdl.apply(variables, jnp.asarray(x_body), x_s_nhwc)
    np.testing.assert_allclose(np.asarray(mu_g_j), mu_g_t.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(lv_g_j), lv_g_t.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(rec_j[:, :3]), x_g_rec_t.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(mu_l_j), mu_l_t.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(lv_l_j), lv_l_t.numpy(), atol=1e-3)
