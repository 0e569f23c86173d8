"""Runtime API-surface gate (VERDICT r2 #4): every module-level public class in
the reference package must resolve from monai_tpu (mirrored module path, subpackage
root, or top level). Threshold 98% so genuinely-new reference classes fail loudly
without being flaky about torch-internal additions."""
from __future__ import annotations

import os
import sys

import pytest

REF = "/root/reference/monai"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not present")
def test_public_class_surface_resolves():
    from api_surface_check import ref_public_classes, try_resolve

    classes = ref_public_classes()
    total = resolved = 0
    missing = []
    seen: set[str] = set()
    for mod, names in classes.items():
        for name in names:
            if name in seen:
                continue
            seen.add(name)
            total += 1
            if try_resolve(name, mod):
                resolved += 1
            else:
                missing.append(f"{mod}.{name}")
    pct = 100.0 * resolved / total
    assert pct >= 98.0, f"API surface {pct:.1f}% < 98%; missing: {missing[:40]}"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not present")
def test_public_function_surface_resolves():
    """VERDICT r3 #7: module-level public functions must resolve >= 95% with the
    documented n/a allowlist (versioneer, TRT engine plumbing, torch JIT ext
    loader, docs-image generation) committed in scripts/api_surface_check.py."""
    from api_surface_check import function_gate

    total, resolved, missing = function_gate(apply_allowlist=True)
    pct = 100.0 * resolved / total
    flat = [f"{m}.{n}" for m, names in missing.items() for n in names]
    assert pct >= 95.0, f"function surface {pct:.1f}% < 95%; missing: {flat[:40]}"
