"""ctypes bindings for the native host-side runtime (``runtime.cpp``).

The compute path is JAX/XLA/Pallas on TPU; this C++ library owns the host
data path: threaded PNG decode (native counterpart of the PIL loader,
reference ``loader.py:40-64``), a background ray-batch producer (native
counterpart of the per-step randperm ray selection, ``trainer.py:102-114``),
and tile stitching for sharded renders.

The shared library builds on first use (``make`` + g++ + libpng); every
entry point has a pure-Python/numpy fallback so the framework works without
a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libnerf_runtime.so")
_lib = None
_lib_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR, "-s"], check=True, capture_output=True
        )
        return True
    except Exception as e:
        print(f"nerf_tpu.runtime: native build failed ({e}); using numpy fallback")
        return False


def _stale() -> bool:
    """True when the .so is missing or older than its C++ source."""
    if not os.path.exists(_SO):
        return True
    src = os.path.join(_DIR, "runtime.cpp")
    try:
        return os.path.getmtime(src) > os.path.getmtime(_SO)
    except OSError:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _stale() and not _build() and not os.path.exists(_SO):
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            print(f"nerf_tpu.runtime: cannot load native library ({e}); "
                  "using numpy fallback")
            return None
        lib.nerf_decode_png_batch.restype = ctypes.c_int
        lib.nerf_decode_png_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_int, ctypes.c_int,
        ]
        lib.nerf_sampler_create.restype = ctypes.c_void_p
        lib.nerf_sampler_create.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_float, ctypes.c_uint32, ctypes.c_uint64,
        ]
        lib.nerf_sampler_next.restype = None
        lib.nerf_sampler_next.argtypes = [ctypes.c_void_p] + [
            ctypes.POINTER(ctypes.c_float)
        ] * 3
        lib.nerf_sampler_destroy.restype = None
        lib.nerf_sampler_destroy.argtypes = [ctypes.c_void_p]
        lib.nerf_assemble_tiles.restype = None
        lib.nerf_assemble_tiles.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_uint64, ctypes.c_uint32,
        ]
        _lib = lib
        return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode_png_batch(
    paths: List[str], img_wh: Tuple[int, int], white_background: bool = True,
    n_threads: int = 0,
) -> np.ndarray:
    """Decode PNGs -> [n, H, W, 3] float32 in [0,1], resized, RGBA composited
    onto white. Native threaded path with PIL fallback."""
    w, h = img_wh
    out = np.empty((len(paths), h, w, 3), np.float32)
    lib = load_library()
    if lib is not None:
        joined = "\n".join(paths).encode()
        failures = lib.nerf_decode_png_batch(
            joined, len(paths), _fptr(out), w, h,
            int(white_background), n_threads,
        )
        if failures == 0:
            return out
        print(f"nerf_tpu.runtime: {failures} native decode failures; PIL fallback")
    from nerf_tpu.data.blender import _load_image

    for i, p in enumerate(paths):
        out[i] = _load_image(p, (w, h))
    return out


class RayBatchSampler:
    """Background native producer of shuffled (rays_o, rays_d, rgb) training
    batches from host-resident images. Use as a context manager."""

    def __init__(self, images: np.ndarray, poses: np.ndarray, focal: float,
                 n_rays: int, seed: int = 0):
        n, h, w, _ = images.shape
        self.n_rays = n_rays
        self.shape = (n, h, w)
        self._images = np.ascontiguousarray(images, np.float32)
        self._poses = np.ascontiguousarray(poses, np.float32)
        self._focal = float(focal)
        self._seed = seed
        self._lib = load_library()
        self._handle = None
        self._rng = np.random.default_rng(seed)  # fallback path

    def __enter__(self):
        if self._lib is not None:
            self._handle = ctypes.c_void_p(self._lib.nerf_sampler_create(
                _fptr(self._images), _fptr(self._poses),
                self.shape[0], self.shape[1], self.shape[2],
                self._focal, self.n_rays, self._seed or 1,
            ))
        return self

    def next_batch(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        rays_o = np.empty((self.n_rays, 3), np.float32)
        rays_d = np.empty((self.n_rays, 3), np.float32)
        rgb = np.empty((self.n_rays, 3), np.float32)
        if self._handle is not None:
            self._lib.nerf_sampler_next(
                self._handle, _fptr(rays_o), _fptr(rays_d), _fptr(rgb)
            )
            return rays_o, rays_d, rgb
        # numpy fallback: same semantics, synchronous
        n, h, w = self.shape
        img = int(self._rng.integers(n))
        pix = self._rng.integers(h * w, size=self.n_rays)
        j, i = pix // w, pix % w
        dc = np.stack(
            [(i - w * 0.5) / self._focal, -(j - h * 0.5) / self._focal,
             -np.ones_like(i, np.float32)], -1,
        ).astype(np.float32)
        P = self._poses[img]
        rays_d[:] = dc @ P[:3, :3].T
        rays_o[:] = P[:3, 3]
        rgb[:] = self._images[img].reshape(-1, 3)[pix]
        return rays_o, rays_d, rgb

    def __exit__(self, *exc):
        if self._handle is not None:
            self._lib.nerf_sampler_destroy(self._handle)
            self._handle = None
        return False


def assemble_tiles(
    tiles: List[np.ndarray], offsets: List[int], frame_rays: int, channels: int
) -> np.ndarray:
    """Stitch row-contiguous ray tiles (e.g. per-chip render shards) into one
    [frame_rays, channels] buffer."""
    frame = np.zeros((frame_rays, channels), np.float32)
    lib = load_library()
    if lib is not None and tiles:
        cat = np.ascontiguousarray(
            np.concatenate([t.reshape(-1, channels) for t in tiles]), np.float32
        )
        offs = np.asarray(offsets, np.uint64)
        lens = np.asarray([t.reshape(-1, channels).shape[0] for t in tiles],
                          np.uint64)
        lib.nerf_assemble_tiles(
            _fptr(cat),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            len(tiles), _fptr(frame), frame_rays, channels,
        )
        return frame
    for t, off in zip(tiles, offsets):
        t2 = t.reshape(-1, channels)
        frame[off : off + t2.shape[0]] = t2
    return frame
