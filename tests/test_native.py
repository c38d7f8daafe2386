"""Native C++ helpers: float parser vs np.loadtxt, C++ ARPA scorer vs the
pure-Python scorer (identical kenlm semantics).  Skipped until
``make -C native`` has produced the shared library."""

import gzip
import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "native", "libpva_native.so")


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    if not os.path.exists(LIB):
        r = subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                           capture_output=True)
        if r.returncode != 0 or not os.path.exists(LIB):
            pytest.skip("native library not built and no toolchain")
    # reset the cached loader state so this module sees the fresh lib
    from pytorch_video_action_tpu.lm import native

    native._TRIED = False
    native._LIB = None
    yield


def test_parse_floats_matches_loadtxt(tmp_path):
    from pytorch_video_action_tpu.data.features import load_feature_file

    rng = np.random.default_rng(0)
    arr = rng.normal(size=(7, 400)).astype(np.float32)
    path = tmp_path / "vid.gz"
    with gzip.open(path, "wt") as f:
        for row in arr:
            f.write(" ".join(f"{v:.6f}" for v in row) + "\n")

    fast = load_feature_file(str(tmp_path), "vid.txt", use_native=True)
    slow = load_feature_file(str(tmp_path), "vid.txt", use_native=False)
    assert fast.shape == slow.shape == (7, 400)
    np.testing.assert_allclose(fast, slow, atol=1e-5)


def test_parse_floats_direct():
    import ctypes

    from pytorch_video_action_tpu.lm.native import load_native_library

    lib = load_native_library()
    assert lib is not None
    data = b"1.5 -2.25 3e2\n4 5 6"
    out = np.empty(16, dtype=np.float32)
    n = lib.pva_parse_floats(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 16
    )
    assert n == 6
    np.testing.assert_allclose(out[:6], [1.5, -2.25, 300.0, 4, 5, 6])


def test_native_arpa_matches_python(tmp_path):
    from pytorch_video_action_tpu.lm.arpa import ArpaLanguageModel
    from pytorch_video_action_tpu.lm.native import NativeArpaModel
    from pytorch_video_action_tpu.lm.train_arpa import train_arpa

    corpus = ["1 2 3", "1 2 3", "1 2 4", "2 3 4", "1 2 3 4", "4 3 2", "1 3"]
    path = str(tmp_path / "lm.arpa")
    train_arpa(corpus, path, order=3)

    py = ArpaLanguageModel(path)
    cc = NativeArpaModel(path)
    assert cc.available
    for sent in ["1 2 3", "1 2 3 4", "4 3 2", "2 2 2", "1 99", "3", ""]:
        assert abs(py.score(sent) - cc.score(sent)) < 1e-4, sent


def test_native_arpa_reads_gzip(tmp_path):
    """The native loader accepts gzipped ARPA like the Python scorer and
    kenlm do (zlib transparent mode covers plain files through the same
    path) — closes the round-1 'three interchangeable scorers' seam."""
    from pytorch_video_action_tpu.lm.arpa import ArpaLanguageModel
    from pytorch_video_action_tpu.lm.native import NativeArpaModel
    from pytorch_video_action_tpu.lm.train_arpa import train_arpa

    corpus = ["1 2 3", "1 2 4", "2 3 4", "4 3 2", "1 3"]
    plain = str(tmp_path / "lm.arpa")
    train_arpa(corpus, plain, order=3)
    gz_path = str(tmp_path / "lm.arpa.gz")
    with open(plain, "rb") as f, gzip.open(gz_path, "wb") as g:
        g.write(f.read())

    py = ArpaLanguageModel(gz_path)
    cc = NativeArpaModel(gz_path)
    assert cc.available
    for sent in ["1 2 3", "4 3 2", "2 2 2", ""]:
        assert abs(py.score(sent) - cc.score(sent)) < 1e-4, sent
