"""Torch checkpoint -> JAX parameter conversion.

Bridges for every weight source the reference consumes:
* VPoser snapshots (``snapshots/*.pt`` discovery convention,
  human_body_prior/tools/model_loader.py:26-73),
* trained HumanCVAES1/S2 ``epoch-*.ckp`` state dicts (train_s1.py:306),
* torchvision ``resnet18.pth`` for scene-encoder init (cvae.py:428-430).

Layout conventions handled:
* torch Linear weight [out, in] -> flax Dense kernel [in, out],
* torch Conv2d [out, in, kh, kw] -> flax Conv [kh, kw, in, out],
* BatchNorm weight/bias/running_mean/running_var ->
  scale/bias + batch_stats {mean, var},
* the scene-feature flatten crossing (torch NCHW channel-major flatten
  vs our NHWC): the first Dense after the flatten gets its input rows
  permuted so outputs are bit-comparable.

torch is only imported inside functions — the framework itself never
depends on it.
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict

import numpy as np


def _dense(sd, name):
    return {
        "kernel": np.asarray(sd[name + ".weight"]).T.astype(np.float32),
        "bias": np.asarray(sd[name + ".bias"]).astype(np.float32),
    }


def _conv(sd, name, bias=False):
    out = {"kernel": np.transpose(np.asarray(sd[name + ".weight"]), (2, 3, 1, 0)).astype(np.float32)}
    if bias:
        out["bias"] = np.asarray(sd[name + ".bias"]).astype(np.float32)
    return out


def _bn(sd, name):
    params = {
        "scale": np.asarray(sd[name + ".weight"]).astype(np.float32),
        "bias": np.asarray(sd[name + ".bias"]).astype(np.float32),
    }
    stats = {
        "mean": np.asarray(sd[name + ".running_mean"]).astype(np.float32),
        "var": np.asarray(sd[name + ".running_var"]).astype(np.float32),
    }
    return params, stats


def _dense_after_flatten(sd, name, c: int, h: int, w: int):
    """Dense whose torch input was a flattened [C, H, W]: permute rows to
    the NHWC flatten order."""
    wt = np.asarray(sd[name + ".weight"])  # [out, C*H*W]
    out_dim = wt.shape[0]
    wt = wt.reshape(out_dim, c, h, w).transpose(2, 3, 1, 0).reshape(h * w * c, out_dim)
    return {"kernel": wt.astype(np.float32), "bias": np.asarray(sd[name + ".bias"]).astype(np.float32)}


def _to_numpy_sd(sd) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


# ---------------------------------------------------------------------------
# VPoser
# ---------------------------------------------------------------------------

_VPOSER_MAP = {
    "bodyprior_enc_bn1": "enc_bn1",
    "bodyprior_enc_fc1": "enc_fc1",
    "bodyprior_enc_bn2": "enc_bn2",
    "bodyprior_enc_fc2": "enc_fc2",
    "bodyprior_enc_mu": "enc_mu",
    "bodyprior_enc_logvar": "enc_logvar",
    "bodyprior_dec_fc1": "dec_fc1",
    "bodyprior_dec_fc2": "dec_fc2",
    "bodyprior_dec_out": "dec_out",
}


def convert_vposer_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Torch VPoser state dict -> flax variables for psi_tpu.body.VPoser."""
    sd = _to_numpy_sd(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for tname, jname in _VPOSER_MAP.items():
        if tname + ".running_mean" in sd:
            p, s = _bn(sd, tname)
            params[jname] = p
            stats[jname] = s
        else:
            params[jname] = _dense(sd, tname)
    return {"params": params, "batch_stats": stats}


def load_vposer_params(path: str) -> Dict[str, Any]:
    """Load VPoser weights from a snapshot dir (newest snapshots/*.pt, the
    reference's expid2model convention), a .pt file, or a converted .npz."""
    if path is None:
        raise ValueError("vposer path is None")
    if os.path.isdir(path):
        pts = sorted(glob.glob(os.path.join(path, "snapshots", "*.pt")), key=os.path.getmtime)
        if not pts:
            pts = sorted(glob.glob(os.path.join(path, "*.pt")), key=os.path.getmtime)
        path = pts[-1]
    if path.endswith(".npz"):
        flat = dict(np.load(path))
        return convert_vposer_state_dict(flat)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_vposer_state_dict(sd)


# ---------------------------------------------------------------------------
# ResNet trunk / scene encoder
# ---------------------------------------------------------------------------


def _convert_basic_block(sd, tprefix):
    params = {}
    stats = {}
    params["conv1"] = _conv(sd, tprefix + ".conv1")
    params["bn1"], stats["bn1"] = _bn(sd, tprefix + ".bn1")
    params["conv2"] = _conv(sd, tprefix + ".conv2")
    params["bn2"], stats["bn2"] = _bn(sd, tprefix + ".bn2")
    if tprefix + ".downsample.0.weight" in sd:
        params["downsample_conv"] = _conv(sd, tprefix + ".downsample.0")
        params["downsample_bn"], stats["downsample_bn"] = _bn(sd, tprefix + ".downsample.1")
    return params, stats


def convert_trunk_state_dict(
    sd: Dict[str, Any],
    stem_key: str = "conv1",
    bn1_key: str = "bn1",
    layer_fmt: str = "layer{stage}.{block}",
) -> Dict[str, Any]:
    """torchvision-style resnet18 weights -> ResNet18Trunk variables.

    For PSI CVAE state dicts (stem replaced + nn.Sequential renumbering:
    resnet.0=stem conv, resnet.1=bn1, resnet.4/5=layer1/2), pass
    stem_key='resnet.0', bn1_key='resnet.1', layer_fmt='resnet.{seq}.{block}'.
    """
    sd = _to_numpy_sd(sd)
    params: Dict[str, Any] = {"conv1": _conv(sd, stem_key)}
    stats: Dict[str, Any] = {}
    params["bn1"], stats["bn1"] = _bn(sd, bn1_key)
    for stage, seq in ((1, 4), (2, 5)):
        for block in range(2):
            t = layer_fmt.format(stage=stage, block=block, seq=seq)
            p, s = _convert_basic_block(sd, t)
            params[f"layer{stage}_{block}"] = p
            stats[f"layer{stage}_{block}"] = s
    return {"params": params, "batch_stats": stats}


def convert_scene_encoder(sd: Dict[str, Any], prefix: str, f_dim: int, spatial: int = 16):
    """Scene encoder (trunk + conv + fc) from a PSI model state dict.
    prefix: '' for S1 (keys resnet.*, conv.*, fc.*) or e.g. 'trans_vae.'"""
    sd = _to_numpy_sd(sd)
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    trunk = convert_trunk_state_dict(
        sub, stem_key="resnet.0", bn1_key="resnet.1", layer_fmt="resnet.{seq}.{block}"
    )
    params = {
        "resnet": trunk["params"],
        "conv": _conv(sub, "conv", bias=True),
        "fc": _dense_after_flatten(sub, "fc", f_dim, spatial, spatial),
    }
    return {"params": params, "batch_stats": {"resnet": trunk["batch_stats"]}}


def _resblocks(sd, tprefix_fmt, n, jprefix_fmt):
    out = {}
    for i in range(n):
        out[jprefix_fmt.format(i)] = {
            "fc1": _dense(sd, tprefix_fmt.format(i) + ".fc1"),
            "fc2": _dense(sd, tprefix_fmt.format(i) + ".fc2"),
        }
    return out


def convert_cvae_s1_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """HumanCVAES1 torch state dict -> flax variables (cvae.py:411-455)."""
    sd = _to_numpy_sd(sd)
    scene = convert_scene_encoder(sd, "", f_dim=32)
    params = {
        "scene": scene["params"],
        "linear_in": _dense(sd, "linear_in"),
        **_resblocks(sd, "human_encoder.{}", 2, "enc_rb{}"),
        "mu_enc": _dense(sd, "mu_enc"),
        "logvar_enc": _dense(sd, "logvar_enc"),
        "linear_latent": _dense(sd, "linear_latent"),
        **_resblocks(sd, "human_decoder.{}", 2, "dec_rb{}"),
        "linear_out": _dense(sd, "linear_out"),
    }
    return {"params": params, "batch_stats": {"scene": scene["batch_stats"]}}


def _convert_sub_vae(sd, prefix, f_dim, n_enc_blocks=2):
    scene = convert_scene_encoder(sd, prefix, f_dim=f_dim)
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params = {
        "scene": scene["params"],
        "torso_linear": _dense(sub, "torso_linear"),
        **_resblocks(sub, "encode.{}", n_enc_blocks, "enc_rb{}"),
        "mean_linear": _dense(sub, "mean_linear"),
        "log_var_linear": _dense(sub, "log_var_linear"),
        "dec_in": _dense(sub, "decode.0"),
        "dec_rb0": {"fc1": _dense(sub, "decode.1.fc1"), "fc2": _dense(sub, "decode.1.fc2")},
        "dec_rb1": {"fc1": _dense(sub, "decode.2.fc1"), "fc2": _dense(sub, "decode.2.fc2")},
        "dec_out": _dense(sub, "decode.3"),
    }
    if "pose_linear.weight" in sub:
        params["pose_linear"] = _dense(sub, "pose_linear")
    return params, {"scene": scene["batch_stats"]}


def load_reference_checkpoint(ckp_path: str, model_type: str = "s1") -> Dict[str, Any]:
    """Load a reference epoch-*.ckp (torch.save dict with
    'model_h_state_dict', train_s1.py:306-310) into flax variables."""
    import torch

    payload = torch.load(ckp_path, map_location="cpu", weights_only=False)
    sd = payload.get("model_h_state_dict", payload)
    conv = convert_cvae_s1_state_dict if model_type == "s1" else convert_cvae_s2_state_dict
    out = conv(sd)
    out["epoch"] = int(payload.get("epoch", 0))
    return out


def convert_cvae_s2_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """HumanCVAES2 torch state dict -> flax variables (cvae.py:341-365,
    net_layers.py:47-234)."""
    sd = _to_numpy_sd(sd)
    tp, ts = _convert_sub_vae(sd, "trans_vae.", f_dim=32)
    pp, ps = _convert_sub_vae(sd, "pose_vae.", f_dim=128)
    return {
        "params": {"trans_vae": tp, "pose_vae": pp},
        "batch_stats": {"trans_vae": ts, "pose_vae": ps},
    }
