"""ctypes bindings to the native C++ helpers (``native/``).

Two entry points live in ``libpva_native.so``:
* ``pva_parse_floats`` — fast whitespace-float parser for the gz text
  feature files (replaces np.loadtxt, the reference's slowest component),
* the ARPA scorer (``pva_lm_load`` / ``pva_lm_score`` / ``pva_lm_free``)
  with kenlm ``score()`` semantics.

Everything degrades gracefully to the pure-Python paths when the library has
not been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os

_LIB = None
_TRIED = False


def _lib_path() -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.join(here, "..", "..", "native", "libpva_native.so")


def load_native_library():
    """Load (and memoize) the helper library.

    Only SUCCESSFUL loads are cached: the library may be built after the
    first failed attempt (e.g. the golden-fixture test runs `make` when it
    finds the scorer unavailable), so a memoized failure would wrongly pin
    every later caller to the Python fallback for the process lifetime.
    """
    global _LIB, _TRIED
    if _LIB is not None:
        return _LIB
    _TRIED = True
    path = os.environ.get("PVA_NATIVE_LIB", _lib_path())
    try:
        lib = ctypes.CDLL(path)
        lib.pva_parse_floats.restype = ctypes.c_long
        lib.pva_parse_floats.argtypes = [
            ctypes.c_char_p,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
        ]
        lib.pva_lm_load.restype = ctypes.c_void_p
        lib.pva_lm_load.argtypes = [ctypes.c_char_p]
        lib.pva_lm_score.restype = ctypes.c_double
        lib.pva_lm_score.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.pva_lm_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


class NativeArpaModel:
    """kenlm-compatible ``score()`` backed by the C++ ARPA scorer."""

    def __init__(self, path: str):
        self._lib = load_native_library()
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.pva_lm_load(path.encode())
        self.available = bool(self._handle)

    def score(self, sentence: str, bos: bool = True, eos: bool = True) -> float:
        if not self.available:
            raise RuntimeError("native ARPA scorer not available")
        if not (bos and eos):
            raise NotImplementedError("native scorer always applies <s>/</s>")
        return self._lib.pva_lm_score(self._handle, sentence.encode())

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            try:
                self._lib.pva_lm_free(self._handle)
            except Exception:
                pass
