"""I3D feature I/O: gzipped-text loading with an ``.npy`` object cache.

The reference loads each video's features with ``np.loadtxt('data/<stem>.gz')``
(``data_utils.py:144-147``) and caches the whole split as pickled object
arrays under ``data-comp/`` (``data_utils.py:161-212``).  We keep the same
cache naming contract so a user's existing caches keep working, and add an
optional native fast path (C++ gz text parser, see ``native/``) because
``np.loadtxt`` is the reference's slowest component.
"""

from __future__ import annotations

import gzip
import os

import numpy as np

from .. import N_FEAT


def _native_parser():
    try:
        from ..lm.native import load_native_library

        lib = load_native_library()
        return lib if lib is not None and hasattr(lib, "pva_parse_floats") else None
    except Exception:
        return None


def load_feature_file(data_dir: str, filename: str, use_native: bool = True) -> np.ndarray:
    """Load one video's ``[T, 400]`` float32 feature matrix from ``<stem>.gz``."""
    stem = os.path.splitext(filename)[0]
    path = os.path.join(data_dir, f"{stem}.gz")
    if use_native:
        arr = _load_native(path)
        if arr is not None:
            return arr
    arr = np.loadtxt(path, dtype="float32")
    if arr.ndim == 1:  # single-frame video
        arr = arr.reshape(1, -1)
    return arr


def _load_native(path: str):
    """Parse the gz text file with the native C++ parser if built (much faster
    than np.loadtxt). Returns None to fall back."""
    lib = _native_parser()
    if lib is None:
        return None
    try:
        import ctypes

        with gzip.open(path, "rb") as f:
            raw = f.read()
        max_floats = max(raw.count(b"\n") + 1, 1) * (N_FEAT + 2)
        out = np.empty(max_floats, dtype=np.float32)
        n = lib.pva_parse_floats(
            raw,
            len(raw),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_floats,
        )
        if n <= 0 or n % N_FEAT != 0:
            return None
        return out[:n].reshape(-1, N_FEAT).copy()
    except Exception:
        return None


def cache_paths(cache_dir: str, part: str, split: int) -> tuple[str, str]:
    """Reference cache naming contract (``data_utils.py:162-163``)."""
    return (
        os.path.join(cache_dir, f"{part}-{split}-features.npy"),
        os.path.join(cache_dir, f"{part}-{split}-labels.npy"),
    )


def load_cached(path: str):
    try:
        return list(np.load(path, allow_pickle=True))
    except Exception:
        return None


def save_cache(path: str, arrays: list[np.ndarray]) -> None:
    try:
        obj = np.empty(len(arrays), dtype=object)
        for i, a in enumerate(arrays):
            obj[i] = a
        np.save(path, obj, allow_pickle=True)
    except Exception as e:  # non-fatal, mirrors reference warning path
        print("[WARNING] Failed to save data cache\n  > ", e)
