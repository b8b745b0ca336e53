"""Native (C) runtime components, loaded via ctypes with pure-Python
fallbacks.

Compilation is lazy and cached: the first import per machine compiles the
.c sources with the system compiler into ``native/_build/``; any failure
(no compiler, sandboxed FS) degrades silently to the numpy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_DIR, "_build")


def _compile(name: str) -> Optional[str]:
    src = os.path.join(_DIR, f"{name}.c")
    so = os.path.join(_BUILD, f"{name}.so")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    cc = os.environ.get("CC") or sysconfig.get_config_var("CC") or "cc"
    cc = cc.split()[0]
    try:
        os.makedirs(_BUILD, exist_ok=True)
        subprocess.run(
            [cc, "-O3", "-march=native", "-shared", "-fPIC", src, "-o", so],
            check=True, capture_output=True, timeout=120,
        )
        return so
    except Exception:
        return None


_s2d_lib = None
_s2d_tried = False


def s2d_pack_fn():
    """The compiled ``s2d_pack_u8`` symbol, or None (use the numpy path)."""
    global _s2d_lib, _s2d_tried
    if not _s2d_tried:
        _s2d_tried = True
        so = _compile("s2d_pack")
        if so is not None:
            try:
                lib = ctypes.CDLL(so)
                lib.s2d_pack_u8.argtypes = [
                    ctypes.c_void_p, ctypes.c_void_p,
                    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_int64,
                ]
                lib.s2d_pack_u8.restype = None
                _s2d_lib = lib.s2d_pack_u8
            except OSError:
                _s2d_lib = None
    return _s2d_lib
