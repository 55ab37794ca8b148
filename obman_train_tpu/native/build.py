"""Lazy g++ build + ctypes loader for the native components.

The reference leaned on external native binaries (pybullet, the V-HACD
executable); this framework ships its own C++ sources and compiles them
on first use (cached by source hash), loaded through ctypes — no pybind11
needed.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(__file__)
_LIB_DIR = os.path.join(_DIR, "lib")


def _build(src_name: str, lib_base: str) -> str:
    src = os.path.join(_DIR, src_name)
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    os.makedirs(_LIB_DIR, exist_ok=True)
    lib_path = os.path.join(_LIB_DIR, f"{lib_base}_{digest}.so")
    if not os.path.exists(lib_path):
        # Compile to a unique temp name and rename atomically: concurrent
        # loader threads may race to first use, and a half-written .so
        # must never become loadable under the cached name.
        tmp_path = f"{lib_path}.{os.getpid()}.{id(object())}.tmp"
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
            "-march=native", src, "-o", tmp_path,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
            os.replace(tmp_path, lib_path)
        except subprocess.CalledProcessError as e:
            raise RuntimeError(
                f"native build failed: {' '.join(cmd)}\n{e.stderr}"
            ) from e
        finally:
            if os.path.exists(tmp_path):
                try:
                    os.remove(tmp_path)
                except OSError:
                    pass
    return lib_path


# None = not tried yet; False = tried and failed (don't retry: a failing
# g++ attempt per image would cripple the input pipeline).
_imageproc_lib = None


def load_imageproc_lib() -> Optional[ctypes.CDLL]:
    """Compile+load the image-warp library; None if no toolchain."""
    global _imageproc_lib
    if _imageproc_lib is not None:
        return _imageproc_lib or None
    try:
        lib = ctypes.CDLL(_build("imageproc.cpp", "libobman_imageproc"))
    except (RuntimeError, OSError):
        _imageproc_lib = False
        return None
    lib.warp_affine_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
    ]
    lib.warp_affine_f32.restype = None
    _imageproc_lib = lib
    return lib


_physics_lib = None  # None = not tried; False = failed (memoized)


def load_physics_lib() -> Optional[ctypes.CDLL]:
    """Compile+load the physics library; returns None if no toolchain."""
    global _physics_lib
    if _physics_lib is not None:
        return _physics_lib or None
    try:
        lib = ctypes.CDLL(_build("physics.cpp", "libobman_physics"))
    except (RuntimeError, OSError):
        _physics_lib = False
        return None
    c_dp = ctypes.POINTER(ctypes.c_double)
    c_ip = ctypes.POINTER(ctypes.c_int32)
    lib.run_grasp_simulation.argtypes = [
        c_dp, ctypes.c_int, c_ip, ctypes.c_int,
        c_dp, ctypes.c_int, c_ip, ctypes.c_int,
        ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ctypes.c_double,
        ctypes.c_double, ctypes.c_double,   # per-body friction (hand, obj)
        ctypes.c_double, ctypes.c_double,   # per-body restitution
        ctypes.c_double,
        c_dp, c_dp,
    ]
    lib.run_grasp_simulation.restype = ctypes.c_int
    _physics_lib = lib
    return lib
