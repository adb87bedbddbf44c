"""ctypes bindings for the native runtime (native/psi_native.cpp).

* ``pack_dataset`` — write the .psipack flat binary from host arrays
  (one-time conversion of HDF5/snapshot data);
* ``NativeBatchGenerator`` — drop-in BatchGenerator backed by the
  mmap'd C++ loader with background double-buffered prefetch: batch
  assembly overlaps device compute, unlike the reference's synchronous
  per-batch python loop (batch_gen_hdf5.py:185-265);
* ``chamfer_nn_cpu`` — native brute-force NN distance (host-side
  verification twin of the Pallas kernel).

The shared library builds on demand with g++ (cached next to the
source); everything degrades gracefully when no compiler is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpsi_native.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "psi_native.cpp")

_IMG = 128 * 128


def _build_lib() -> str:
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC_PATH):
        return _LIB_PATH
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-fPIC", "-Wall", "-pthread", "-shared",
         "-o", _LIB_PATH, _SRC_PATH],
        check=True,
        capture_output=True,
    )
    return _LIB_PATH


_lib = None


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build_lib())
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int)
        lib.chamfer_nn.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int, f32p, i32p]
        lib.pack_write.argtypes = [ctypes.c_char_p] + [f32p] * 6 + [i32p, ctypes.c_int]
        lib.pack_write.restype = ctypes.c_int
        lib.loader_create.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_uint64, ctypes.c_int]
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_num_samples.argtypes = [ctypes.c_void_p]
        lib.loader_num_samples.restype = ctypes.c_int
        lib.loader_next.argtypes = [ctypes.c_void_p] + [f32p] * 6 + [i32p]
        lib.loader_next.restype = ctypes.c_int
        lib.loader_reset.argtypes = [ctypes.c_void_p]
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def native_available() -> bool:
    try:
        get_lib()
        return True
    except Exception:
        return False


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def chamfer_nn_cpu(x: np.ndarray, y: np.ndarray):
    """x [N, 3], y [M, 3] -> (dist [N], idx [N]); native brute force."""
    lib = get_lib()
    x = np.ascontiguousarray(x, np.float32)
    y = np.ascontiguousarray(y, np.float32)
    dist = np.empty(len(x), np.float32)
    idx = np.empty(len(x), np.int32)
    lib.chamfer_nn(_fp(x), len(x), _fp(y), len(y), _fp(dist), _ip(idx))
    return dist, idx


def pack_dataset(
    path: str,
    depth: np.ndarray,
    seg: np.ndarray,
    body: np.ndarray,
    cam_ext: np.ndarray,
    cam_int: np.ndarray,
    max_d: np.ndarray,
    sceneid: np.ndarray,
) -> str:
    """Write the .psipack flat binary (n samples)."""
    lib = get_lib()
    n = depth.shape[0]
    args = [
        np.ascontiguousarray(depth, np.float32).reshape(n, _IMG),
        np.ascontiguousarray(seg, np.float32).reshape(n, _IMG),
        np.ascontiguousarray(body, np.float32).reshape(n, 72),
        np.ascontiguousarray(cam_ext, np.float32).reshape(n, 16),
        np.ascontiguousarray(cam_int, np.float32).reshape(n, 9),
        np.ascontiguousarray(max_d, np.float32).reshape(n),
    ]
    sid = np.ascontiguousarray(sceneid, np.int32).reshape(n)
    rc = lib.pack_write(path.encode(), *[_fp(a) for a in args], _ip(sid), n)
    if rc != 0:
        raise OSError(f"pack_write failed: {path}")
    return path


def hdf5_to_pack(hdf5_paths, pack_path: str) -> str:
    """Convert reference-format HDF5(s) to the native pack."""
    from psi_tpu.data.hdf5 import _load_streams

    s = _load_streams(hdf5_paths)
    n = s["depth"].shape[0]
    return pack_dataset(
        pack_path,
        s["depth"].reshape(n, -1), s["seg"].reshape(n, -1),
        s["body"].reshape(n, -1), s["cam_ext"].reshape(n, -1),
        s["cam_int"].reshape(n, -1), s["max_d"].reshape(n),
        s["sceneid"].reshape(n).astype(np.int32),
    )


class NativeBatchGenerator:
    """BatchGenerator interface over the C++ prefetching loader."""

    def __init__(self, pack_path: str, batch_size: int, seed: int = 0):
        self._lib = get_lib()
        self.batch_size = batch_size
        self._h = self._lib.loader_create(pack_path.encode(), batch_size, seed, 1)
        if not self._h:
            raise OSError(f"loader_create failed: {pack_path}")
        self.n_samples = self._lib.loader_num_samples(self._h)
        self._served = 0
        b = batch_size
        self._depth = np.empty((b, 128, 128), np.float32)
        self._seg = np.empty((b, 128, 128), np.float32)
        self._body = np.empty((b, 72), np.float32)
        self._cam_ext = np.empty((b, 4, 4), np.float32)
        self._cam_int = np.empty((b, 3, 3), np.float32)
        self._max_d = np.empty(b, np.float32)
        self._sceneid = np.empty(b, np.int32)

    def has_next_batch(self) -> bool:
        return self._served + self.batch_size <= self.n_samples

    def reset(self) -> None:
        self._lib.loader_reset(self._h)
        self._served = 0

    def next_batch(self, batch_size: Optional[int] = None) -> Optional[Dict[str, np.ndarray]]:
        ok = self._lib.loader_next(
            self._h, _fp(self._depth), _fp(self._seg), _fp(self._body),
            _fp(self._cam_ext), _fp(self._cam_int), _fp(self._max_d), _ip(self._sceneid),
        )
        if not ok:
            return None
        self._served += self.batch_size
        xs = np.stack([self._depth, self._seg], axis=-1)
        return {
            "xs": xs.copy(),
            "xh": self._body.copy(),
            "cam_ext": self._cam_ext.copy(),
            "cam_int": self._cam_int.copy(),
            "max_d": self._max_d.copy(),
            "scene_idx": self._sceneid.copy(),
        }

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.loader_destroy(self._h)
                self._h = None
        except Exception:
            pass
