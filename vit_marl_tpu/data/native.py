"""Lazy-built native (C++) LOBSTER CSV parser with a transparent fallback.

The parser source lives in ``native/lobster_parser.cpp`` and is compiled on
first use with the system toolchain (g++; pybind11 is not in this image so
the extension uses the raw CPython C API and returns bytes that numpy wraps
zero-copy-ish with ``frombuffer``).  If compilation or import fails the
caller falls back to the numpy path (``np.loadtxt`` + ``_preprocess_day``)
— behaviour is identical, only ~4.5x slower (differential-tested in
tests/test_native_loader.py).
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "lobster_parser.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")

_lock = threading.Lock()
_module = None
_tried = False


def _build_and_import():
    """Compile the extension if needed and import it; None on failure."""
    so_path = os.path.join(
        _BUILD_DIR, f"_lobster_native{sysconfig.get_config_var('EXT_SUFFIX')}")
    if not os.path.exists(so_path) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(so_path)):
        os.makedirs(_BUILD_DIR, exist_ok=True)
        include = sysconfig.get_path("include")
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
               f"-I{include}", _SRC, "-o", so_path]
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
        if r.returncode != 0:
            print("native lobster parser build failed (falling back to "
                  f"numpy loader): {r.stderr.strip().splitlines()[-1:]}",
                  file=sys.stderr)
            return None
    import importlib.util
    spec = importlib.util.spec_from_file_location("_lobster_native", so_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def get_native_module():
    """The compiled extension module, or None if unavailable."""
    global _module, _tried
    with _lock:
        if not _tried:
            _tried = True
            try:
                _module = _build_and_import()
            except Exception as e:  # toolchain missing, sandboxed, ...
                print(f"native lobster parser unavailable ({e}); using "
                      "numpy loader", file=sys.stderr)
                _module = None
    return _module


def parse_day_native(msg_path: str, book_path: str, day_start: int,
                     day_end: int
                     ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(msgs (N, 8) int32, book (N, 4*levels) int64) or None if the native
    parser is unavailable.  Raises OSError on unreadable files (mirrors the
    numpy path's behaviour of rejecting the day)."""
    mod = get_native_module()
    if mod is None:
        return None
    msgs_b, n, book_b, book_cols = mod.parse_day(
        msg_path, book_path, int(day_start), int(day_end))
    msgs = np.frombuffer(msgs_b, dtype=np.int32).reshape(n, 8).copy()
    book = np.frombuffer(book_b, dtype=np.int64).reshape(n, book_cols).copy()
    return msgs, book
