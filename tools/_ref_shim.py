"""Run the LITERAL reference ``train.py`` under modern numpy.

The reference was written against numpy < 1.24, where ``np.array(ragged)``
silently produced an object array; modern numpy raises ``ValueError:
... inhomogeneous shape`` inside ``data_utils.py:231`` (``_exclude_label``
returns per-video arrays of differing lengths).  This shim changes NO
reference behavior — it swaps ``data_utils``'s module-level ``np`` for a
proxy whose ``array``/``save`` retry with ``dtype=object`` exactly where
old numpy would have produced an object array, then execs the reference
``train.py`` unmodified.

Usage (cwd = dataset root, like the reference expects)::

    python /root/repo/tools/_ref_shim.py --model bigru --epoch 3 ...
"""

from __future__ import annotations

import runpy
import sys

import numpy as np

REF = "/root/reference"


class _NumpyCompat:
    """Delegates to numpy; ``array``/``asarray``/``save`` fall back to
    object dtype on the ragged-input ValueError new numpy raises."""

    def __getattr__(self, name):
        return getattr(np, name)

    @staticmethod
    def _obj(fn, *args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except ValueError as e:
            if "inhomogeneous" not in str(e):
                raise
            kwargs["dtype"] = object
            return fn(*args, **kwargs)

    def array(self, *args, **kwargs):
        return self._obj(np.array, *args, **kwargs)

    def asarray(self, *args, **kwargs):
        return self._obj(np.asarray, *args, **kwargs)

    def save(self, file, arr, **kwargs):
        try:
            return np.save(file, arr, **kwargs)
        except ValueError as e:
            if "inhomogeneous" not in str(e):
                raise
            return np.save(file, np.array(arr, dtype=object), **kwargs)


def main():
    sys.path.insert(0, REF)
    import data_utils  # noqa: E402 (reference module)

    data_utils.np = _NumpyCompat()
    sys.argv[0] = f"{REF}/train.py"
    runpy.run_path(f"{REF}/train.py", run_name="__main__")


if __name__ == "__main__":
    main()
