"""Result visualization: render scene + generated bodies to PNG.

Equivalent of utils/utils_show_test_results{,_habitat}.py (Open3D
windows there; our software renderer here): load generated/fitted
body_gen_*.pkl files, decode SMPL-X meshes, transform by cam_ext, and
render shaded color images from one or more viewpoints.
"""

from __future__ import annotations

import glob
import os
import pickle
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from psi_tpu.body.decode import body_vec_to_verts
from psi_tpu.geometry.bodyvec import body_params_parse
from psi_tpu.viz.colors import BODY_COLORS, mpcat40_color
from psi_tpu.viz.render import render_depth_semantics


def render_color(
    verts: np.ndarray,
    colors: np.ndarray,
    cam_int: np.ndarray,
    height: int,
    width: int,
    cam_ext: Optional[np.ndarray] = None,
    splat_radius: int = 1,
) -> np.ndarray:
    """Point-splat color render with simple depth-based shading -> [H, W, 3]."""
    # reuse the depth/label zbuffer with per-point color indices
    uniq_colors, inv = np.unique(np.round(colors * 63).astype(np.int32), axis=0, return_inverse=True)
    if len(uniq_colors) > 63:  # quantize palette if needed
        inv = inv % 63
        uniq_colors = uniq_colors[:63]
    depth, label = render_depth_semantics(
        jnp.asarray(verts, jnp.float32), jnp.asarray(inv + 1), jnp.asarray(cam_int, jnp.float32),
        height, width,
        cam_ext=jnp.asarray(cam_ext, jnp.float32) if cam_ext is not None else None,
        splat_radius=splat_radius,
    )
    depth = np.asarray(depth)
    label = np.asarray(label).astype(np.int32)
    img = np.ones((height, width, 3), np.float32)
    palette = np.concatenate([np.zeros((1, 3)), uniq_colors / 63.0], axis=0)
    img = palette[np.clip(label, 0, len(palette) - 1)]
    # depth-based dimming for a simple shading cue
    d = depth.copy()
    d[d == 0] = d.max() if d.max() > 0 else 1.0
    shade = 1.0 - 0.35 * (d - d.min()) / max(d.max() - d.min(), 1e-6)
    img = np.clip(img * shade[..., None], 0, 1)
    img[label == 0] = 1.0  # background white
    return (img * 255).astype(np.uint8)


def show_generated_results(
    assets,
    results_dir: str,
    scene_verts: np.ndarray,
    scene_labels: np.ndarray,
    cam_int: np.ndarray,
    out_dir: str,
    image_hw: Tuple[int, int] = (480, 640),
    max_bodies: int = 20,
    view_cam_ext: Optional[np.ndarray] = None,
) -> List[str]:
    """Render up to max_bodies generated bodies into the scene; one PNG per
    body plus a combined view (reference renders 2 views/body,
    utils_show_test_results.py:150-205)."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    h, w = image_hw
    scene_colors = mpcat40_color(scene_labels)

    pkls = sorted(glob.glob(os.path.join(results_dir, "body_gen_*.pkl")))[:max_bodies]
    outfiles = []
    all_body_verts = []
    for p in pkls:
        with open(p, "rb") as f:
            rec = pickle.load(f)
        x72 = np.asarray(body_params_parse(rec)).reshape(1, -1)
        cam_ext = np.asarray(rec["cam_ext"], np.float32).reshape(1, 4, 4)
        verts, _ = body_vec_to_verts(assets.smplx, assets.vposer_params, jnp.asarray(x72), jnp.asarray(cam_ext))
        # bodies are generated in the camera frame; map to world via inv(cam_ext)
        inv_ext = np.linalg.inv(cam_ext[0])
        bv = np.asarray(verts[0]) @ inv_ext[:3, :3].T + inv_ext[:3, 3]
        all_body_verts.append(bv)

    for i, bv in enumerate(all_body_verts):
        verts = np.concatenate([scene_verts, bv], axis=0)
        colors = np.concatenate(
            [scene_colors, np.tile(BODY_COLORS["blue"], (len(bv), 1))], axis=0
        )
        img = render_color(verts, colors, cam_int, h, w, cam_ext=view_cam_ext)
        out = os.path.join(out_dir, f"body_{i:03d}.png")
        Image.fromarray(img).save(out)
        outfiles.append(out)

    if all_body_verts:
        verts = np.concatenate([scene_verts] + all_body_verts, axis=0)
        colors = np.concatenate(
            [scene_colors]
            + [np.tile(BODY_COLORS["blue"], (len(b), 1)) for b in all_body_verts],
            axis=0,
        )
        img = render_color(verts, colors, cam_int, h, w, cam_ext=view_cam_ext)
        out = os.path.join(out_dir, "all_bodies.png")
        Image.fromarray(img).save(out)
        outfiles.append(out)
    return outfiles
