"""tools/verify_bundle.py on the synthetic reference-format bundle: every
family's torch-vs-JAX activation diff must be within tolerance (VERDICT r2
item 4 — the one-command validation path for the day a real GenVC checkpoint
is available)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


@pytest.fixture(scope="module")
def bundle_path(tmp_path_factory):
    from synthetic_bundle import write_bundle

    path = str(tmp_path_factory.mktemp("vb") / "tiny_genvc.pth")
    write_bundle(path)
    return path


def test_verify_bundle_all_families(bundle_path):
    from tools.verify_bundle import TOLERANCES, verify

    results = verify(bundle_path)
    assert set(results) == set(TOLERANCES), results
    for fam, (diff, ok) in results.items():
        assert ok, f"{fam}: diff {diff} exceeds {TOLERANCES[fam]}"
        assert diff < 1e-4 or fam == "contentvec", (fam, diff)
