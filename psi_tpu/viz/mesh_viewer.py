"""Offscreen MeshViewer on the software renderer.

API-parity with human_body_prior/mesh/mesh_viewer.py (pyrender there):
set_meshes / render / save_snapshot, plus the imagearray2file grid
writer from tools/visualization_tools.py:30-170 (png/gif/mp4 via
imageio when available).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from psi_tpu.viz.render import upsample_mesh
from psi_tpu.viz.show_results import render_color


class MeshViewer:
    def __init__(self, width: int = 800, height: int = 800, use_offscreen: bool = True):
        self.width = width
        self.height = height
        f = 1.5 * max(width, height)
        self.cam_int = np.array(
            [[f, 0, width / 2.0], [0, f, height / 2.0], [0, 0, 1.0]], np.float32
        )
        self.cam_ext = np.eye(4, dtype=np.float32)
        self.cam_ext[2, 3] = 2.5  # default: camera 2.5m back
        self._meshes: List[Tuple[np.ndarray, np.ndarray]] = []  # (verts, colors)

    def set_cam(self, cam_ext: np.ndarray, cam_int: Optional[np.ndarray] = None) -> None:
        self.cam_ext = np.asarray(cam_ext, np.float32)
        if cam_int is not None:
            self.cam_int = np.asarray(cam_int, np.float32)

    def set_meshes(
        self,
        meshes: Sequence[Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]],
        group_name: str = "static",
        densify: int = 1,
    ) -> None:
        """meshes: list of (verts, faces, vertex_colors|None)."""
        self._meshes = []
        for item in meshes:
            verts, faces = item[0], item[1]
            colors = item[2] if len(item) > 2 and item[2] is not None else np.full((len(verts), 3), 0.6)
            if densify and faces is not None and len(faces):
                v2, _ = upsample_mesh(verts, faces, densify)
                extra = len(v2) - len(verts)
                colors = np.concatenate([colors, np.tile(colors.mean(0, keepdims=True), (extra, 1))])
                verts = v2
            self._meshes.append((np.asarray(verts, np.float32), np.asarray(colors, np.float32)))

    def render(self) -> np.ndarray:
        if not self._meshes:
            return np.full((self.height, self.width, 3), 255, np.uint8)
        verts = np.concatenate([m[0] for m in self._meshes], axis=0)
        colors = np.concatenate([m[1] for m in self._meshes], axis=0)
        return render_color(verts, colors, self.cam_int, self.height, self.width, cam_ext=self.cam_ext)

    def save_snapshot(self, path: str) -> str:
        from PIL import Image

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        Image.fromarray(self.render()).save(path)
        return path


def imagearray2file(img_array: np.ndarray, outpath: str, fps: int = 10) -> List[str]:
    """[R, C, T, H, W, 3] uint8/float grid -> png (T=1), gif, or mp4.

    Grid cells tile rows x cols per frame (visualization_tools.py:30-170)."""
    import imageio

    arr = np.asarray(img_array)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8) if arr.max() > 1.5 else (arr * 255).astype(np.uint8)
    R, C, T, H, W, _ = arr.shape
    frames = [
        arr[:, :, t].transpose(0, 2, 1, 3, 4).reshape(R * H, C * W, 3) for t in range(T)
    ]
    os.makedirs(os.path.dirname(outpath) or ".", exist_ok=True)
    ext = os.path.splitext(outpath)[1].lower()
    if ext == ".png" or T == 1 and ext not in (".gif", ".mp4"):
        imageio.imwrite(outpath, frames[0])
    elif ext == ".gif":
        imageio.mimwrite(outpath, frames, duration=1.0 / fps)
    else:
        imageio.mimwrite(outpath, frames, fps=fps)
    return [outpath]
