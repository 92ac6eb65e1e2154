"""Native (C) components, compiled on demand and loaded via ctypes.

The build is cached in ``ss_asr_tpu/native/build/`` keyed by source mtime; a
pure-Python fallback is always available so the framework never hard-fails on a
machine without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_HERE, "build")
_LOCK = threading.Lock()
_LIBS: dict[str, ctypes.CDLL | None] = {}


def _compile(src_name: str, lib_name: str) -> str | None:
    src = os.path.join(_HERE, src_name)
    out = os.path.join(_BUILD_DIR, lib_name)
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O3", "-shared", "-fPIC", "-o", out, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError) as e:  # pragma: no cover
        print(f"[ss_asr_tpu.native] build of {src_name} failed: {e}", file=sys.stderr)
        return None
    return out


def load(src_name: str, lib_name: str) -> ctypes.CDLL | None:
    """Compile-if-needed and dlopen a native component; None on failure."""
    with _LOCK:
        if lib_name in _LIBS:
            return _LIBS[lib_name]
        path = _compile(src_name, lib_name)
        lib = None
        if path is not None:
            try:
                lib = ctypes.CDLL(path)
            except OSError as e:  # pragma: no cover
                print(f"[ss_asr_tpu.native] dlopen failed: {e}", file=sys.stderr)
        _LIBS[lib_name] = lib
        return lib
