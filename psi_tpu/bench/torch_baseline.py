"""Reference-semantics CPU baseline for the headline benchmark.

The reference repo publishes no numbers (BASELINE.md), so the baseline
is measured fresh: a PyTorch CPU transcription of the reference's
generation + fitting pipeline semantics (test_proxe_s1.py +
fitting_proxe.py) on the same synthetic assets the TPU build benches
against:

* sample: scene-encoder trunk + decoder forward (the reference repeats
  the scene image n_samples times through the trunk, test_proxe_s1.py:104
  — reproduced faithfully);
* fit: per body, batch_size=1, Adam(lr=0.1), num_iter steps of
  L1-to-init + VPoser reg + brute-force chamfer contact + grid_sample
  SDF collision, rebuilding the graph every iteration
  (fitting_proxe.py:177-189).

This is independent torch code written for measurement — the same math,
none of the reference's source. Two deliberate approximations, both of
which make the BASELINE faster (so the reported multiplier is
conservative): the scene trunk is a structure-matched hand-rolled
residual stack at the reference's tensor shapes, not torchvision's
resnet18 (which has more layers/channels); and the SMPL-X constants are
synthetic at real shapes. The fit loss itself matches the reference's
per-iteration graph, including the 6D→matrot→axis-angle conversion of
the global rotation every step (fitting_proxe.py:107, cvae.py:129-137).
"""

from __future__ import annotations

import time
from typing import Tuple

import numpy as np


def measure_torch_baseline(
    smplx_np: dict,
    vposer_dims: Tuple[int, int] = (32, 512),
    contact_ids: np.ndarray = None,
    scene_verts: np.ndarray = None,
    sdf: np.ndarray = None,
    grid_min: np.ndarray = None,
    grid_max: np.ndarray = None,
    n_bodies: int = 2,
    n_samples_batch: int = 32,
    num_iter: int = 20,
    latentD: int = 256,
    image_size: int = 128,
    seed: int = 0,
) -> float:
    """Returns bodies (sampled+fitted) per second on CPU torch."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.set_num_threads(max(1, torch.get_num_threads()))
    torch.manual_seed(seed)
    dev = torch.device("cpu")

    # ---- model pieces (structure-matched, random weights) ----
    class Trunk(nn.Module):
        def __init__(self):
            super().__init__()
            def block(cin, cout, stride):
                return nn.Sequential(
                    nn.Conv2d(cin, cout, 3, stride, 1, bias=False), nn.BatchNorm2d(cout), nn.ReLU(),
                    nn.Conv2d(cout, cout, 3, 1, 1, bias=False), nn.BatchNorm2d(cout),
                )
            self.stem = nn.Sequential(
                nn.Conv2d(2, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64), nn.ReLU(),
                nn.MaxPool2d(3, 2, 1),
            )
            self.l1a, self.l1b = block(64, 64, 1), block(64, 64, 1)
            self.l2a, self.l2b = block(64, 128, 2), block(128, 128, 1)
            self.l2a_down = nn.Sequential(nn.Conv2d(64, 128, 1, 2, bias=False), nn.BatchNorm2d(128))
            self.conv = nn.Conv2d(128, 32, 3, 1, 1)
            self.fc = nn.Linear(32 * (image_size // 8) ** 2, latentD)

        def forward(self, x):
            x = self.stem(x)
            x = F.relu(self.l1a(x) + x)
            x = F.relu(self.l1b(x) + x)
            x = F.relu(self.l2a(x) + self.l2a_down(x))
            x = F.relu(self.l2b(x) + x)
            x = self.conv(x)
            return self.fc(x.flatten(1))

    class Decoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.lin_latent = nn.Linear(32, latentD)
            self.rb = nn.ModuleList([nn.Linear(2 * latentD, 2 * latentD) for _ in range(4)])
            self.out = nn.Linear(2 * latentD, 75)

        def forward(self, z, zs):
            h = torch.cat([self.lin_latent(z), zs], 1)
            for i in range(0, 4, 2):
                x = F.leaky_relu(self.rb[i](h))
                x = F.leaky_relu(self.rb[i + 1](x))
                h = h + x
            return self.out(h)

    latent_vp, hid_vp = vposer_dims

    class VPoserDec(nn.Module):
        def __init__(self, n_joints):
            super().__init__()
            self.fc1 = nn.Linear(latent_vp, hid_vp)
            self.fc2 = nn.Linear(hid_vp, hid_vp)
            self.out = nn.Linear(hid_vp, n_joints * 6)
            self.n_joints = n_joints

        def forward(self, z):
            x = F.leaky_relu(self.fc1(z), 0.2)
            x = F.leaky_relu(self.fc2(x), 0.2)
            x6 = self.out(x).view(-1, 3, 2)
            b1 = F.normalize(x6[:, :, 0], dim=1)
            dot = (b1 * x6[:, :, 1]).sum(1, keepdim=True)
            b2 = F.normalize(x6[:, :, 1] - dot * b1, dim=1)
            b3 = torch.cross(b1, b2, dim=1)
            R = torch.stack([b1, b2, b3], dim=-1)  # [B*J, 3, 3]
            # matrot -> axis-angle via quaternion
            q = _mat2quat(R)
            return _quat2aa(q).reshape(z.shape[0], -1)

    def _mat2quat(R):
        tr = R[:, 0, 0] + R[:, 1, 1] + R[:, 2, 2]
        w = torch.sqrt(torch.clamp(1 + tr, min=1e-8)) / 2
        x = (R[:, 2, 1] - R[:, 1, 2]) / (4 * w)
        y = (R[:, 0, 2] - R[:, 2, 0]) / (4 * w)
        z = (R[:, 1, 0] - R[:, 0, 1]) / (4 * w)
        return torch.stack([w, x, y, z], 1)

    def _quat2aa(q):
        w, v = q[:, :1], q[:, 1:]
        sin_half = v.norm(dim=1, keepdim=True).clamp(min=1e-8)
        theta = 2 * torch.atan2(sin_half, w)
        return v / sin_half * theta

    def rodrigues(aa):
        theta = aa.norm(dim=-1, keepdim=True).clamp(min=1e-8)
        k = aa / theta
        K = torch.zeros(aa.shape[0], 3, 3)
        K[:, 0, 1], K[:, 0, 2] = -k[:, 2], k[:, 1]
        K[:, 1, 0], K[:, 1, 2] = k[:, 2], -k[:, 0]
        K[:, 2, 0], K[:, 2, 1] = -k[:, 1], k[:, 0]
        s = theta.sin().unsqueeze(-1)
        c = theta.cos().unsqueeze(-1)
        return torch.eye(3) + s * K + (1 - c) * (K @ K)

    # SMPL-X constants
    vt = torch.tensor(smplx_np["v_template"])
    shd = torch.tensor(smplx_np["shapedirs"])
    psd = torch.tensor(smplx_np["posedirs"]) if smplx_np.get("posedirs") is not None else None
    Jreg = torch.tensor(smplx_np["J_regressor"])
    W = torch.tensor(smplx_np["lbs_weights"])
    parents = smplx_np["parents"]
    nJ = len(parents)

    def lbs_fwd(betas, pose):
        v_shaped = vt + torch.einsum("bl,mkl->bmk", betas, shd)
        J = torch.einsum("bik,ji->bjk", v_shaped, Jreg)
        R = rodrigues(pose.reshape(-1, 3)).reshape(-1, nJ, 3, 3)
        if psd is not None:
            feat = (R[:, 1:] - torch.eye(3)).reshape(R.shape[0], -1)
            v_shaped = v_shaped + (feat @ psd).reshape(R.shape[0], -1, 3)
        G = [None] * nJ
        rel = J.clone()
        rel[:, 1:] -= J[:, parents[1:]]
        for j in range(nJ):
            T = torch.zeros(R.shape[0], 4, 4)
            T[:, :3, :3] = R[:, j]
            T[:, :3, 3] = rel[:, j]
            T[:, 3, 3] = 1
            G[j] = T if parents[j] < 0 else G[parents[j]] @ T
        G = torch.stack(G, 1)
        A = G.clone()
        A[:, :, :3, 3] -= torch.einsum("bjxy,bjy->bjx", G[:, :, :3, :3], J)
        T = torch.einsum("vj,bjxy->bvxy", W, A)
        return torch.einsum("bvxy,bvy->bvx", T[:, :, :3, :3], v_shaped) + T[:, :, :3, 3]

    n_betas = shd.shape[-1]
    n_hand = smplx_np.get("n_hand_pca", 12)
    vposer = VPoserDec((nJ * 3 - 3 - 90 - 9) // 3 if nJ == 55 else nJ - 1)

    def body_to_verts(x72):
        pose_vp = x72[:, 16:48][:, :latent_vp]
        aa = vposer(pose_vp)
        if nJ == 55:
            pose = torch.cat([x72[:, 3:6], aa, torch.zeros(x72.shape[0], 9 + 90)], 1)
        else:
            need = (nJ - 1) * 3
            pose = torch.cat([x72[:, 3:6], aa[:, :need]], 1)
            if pose.shape[1] < nJ * 3:
                pose = torch.cat([pose, torch.zeros(x72.shape[0], nJ * 3 - pose.shape[1])], 1)
        betas = x72[:, 6 : 6 + n_betas]
        return lbs_fwd(betas, pose) + x72[:, :3].unsqueeze(1)

    sverts = torch.tensor(scene_verts)
    sdf_t = torch.tensor(sdf).unsqueeze(0).unsqueeze(0)
    gmin = torch.tensor(grid_min)
    gmax = torch.tensor(grid_max)
    cids = torch.tensor(contact_ids, dtype=torch.long)

    def rot6d_to_aa(x6):
        # the reference converts the 6D global rotation to axis-angle via
        # Gram-Schmidt + tgm matrot->aa EVERY fit iteration
        # (fitting_proxe.py:107, cvae.py:129-137); same graph here
        x6 = x6.view(-1, 3, 2)
        b1 = F.normalize(x6[:, :, 0], dim=1)
        dot = (b1 * x6[:, :, 1]).sum(1, keepdim=True)
        b2 = F.normalize(x6[:, :, 1] - dot * b1, dim=1)
        b3 = torch.cross(b1, b2, dim=1)
        R = torch.stack([b1, b2, b3], dim=-1)
        return _quat2aa(_mat2quat(R))

    def fit_loss(xhr, xhr0):
        loss_rec = F.l1_loss(xhr, xhr0)
        x72 = torch.cat([xhr[:, :3], rot6d_to_aa(xhr[:, 3:9]), xhr[:, 9:]], 1)
        loss_vp = 0.01 * (x72[:, 16:48] ** 2).mean()
        verts = body_to_verts(x72)
        cv = verts[:, cids]
        d = torch.cdist(cv[0], sverts) ** 2
        dist1 = d.min(dim=1).values
        s = torch.sqrt(dist1 + 1e-4)
        loss_contact = 0.1 * (s / (s + 0.01)).mean()
        norm = (verts - gmin) / (gmax - gmin) * 2 - 1
        vals = F.grid_sample(
            sdf_t, norm[:, :, [2, 1, 0]].view(1, -1, 1, 1, 3),
            padding_mode="border", align_corners=False,
        )
        neg = vals[vals < 0]
        loss_coll = 0.5 * (neg.abs().mean() if neg.numel() > 0 else torch.tensor(0.0))
        return loss_rec + loss_vp + loss_contact + loss_coll

    trunk = Trunk().eval()
    dec = Decoder().eval()

    # ---- measure: sampling (one n_samples batch through the trunk) ----
    t0 = time.time()
    with torch.no_grad():
        xs = torch.randn(1, 2, image_size, image_size).repeat(n_samples_batch, 1, 1, 1)
        zs = trunk(xs)
        x_gen = dec(torch.randn(n_samples_batch, 32), zs)
    sample_time_per_body = (time.time() - t0) / n_samples_batch

    # ---- measure: fitting, one body at a time (reference batch_size=1) ----
    t0 = time.time()
    for b in range(n_bodies):
        xhr0 = torch.randn(1, 75) * 0.3
        xhr0[:, 2] += 3.0
        xhr = xhr0.clone().requires_grad_(True)
        opt = torch.optim.Adam([xhr], lr=0.1)
        for _ in range(num_iter):
            opt.zero_grad()
            loss = fit_loss(xhr, xhr0)
            loss.backward()
            opt.step()
    fit_time_per_body = (time.time() - t0) / n_bodies

    per_body = sample_time_per_body + fit_time_per_body
    return 1.0 / per_body
