"""PARITY.md is the component-parity contract: every implementation path and
every named test it cites must actually exist (VERDICT r1: one false row —
a claimed bilstm_lm parity test that didn't exist — taints the whole map).
This audit keeps the document honest mechanically.
"""

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parity_md_references_resolve():
    s = open(os.path.join(REPO, "PARITY.md")).read()

    file_refs = set(re.findall(r"tests/test_\w+\.py(?:::\w+)?", s))
    bare_tests = set(re.findall(r"::(test_\w+)", s))
    test_dir = os.path.join(REPO, "tests")
    all_test_src = "\n".join(
        open(os.path.join(test_dir, f)).read()
        for f in os.listdir(test_dir) if f.endswith(".py")
    )

    missing = []
    for r in sorted(file_refs):
        f = os.path.join(REPO, r.split("::")[0])
        if not os.path.exists(f):
            missing.append(r)
        elif "::" in r and r.split("::")[1] not in open(f).read():
            missing.append(r)
    for t in sorted(bare_tests):
        if f"def {t}" not in all_test_src:
            missing.append(t)
    assert not missing, f"PARITY.md cites nonexistent tests: {missing}"

    impls = set(re.findall(r"P/[\w/]+\.py", s)) | set(
        re.findall(r"`(native/[\w/]+\.cc)`", s)
    )
    missing_impl = [
        i for i in sorted(impls)
        if not os.path.exists(
            os.path.join(REPO, i.replace("P/", "pytorch_video_action_tpu/"))
        )
    ]
    assert not missing_impl, f"PARITY.md cites missing files: {missing_impl}"
