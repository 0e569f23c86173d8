"""Runtime API-surface check (VERDICT r2 #4 acceptance): collect every public
class defined in the reference package (`/root/reference/monai`) via AST, then
try to resolve the same name from monai_tpu at runtime — first from the
mirrored module path, then from the subpackage root, then from the top level.

Prints a JSON summary plus the unresolved names grouped by reference module.

Run: ./pt scripts/api_surface_check.py   (or python with JAX_PLATFORMS=cpu)
"""
from __future__ import annotations

import ast
import importlib
import json
import sys
from pathlib import Path

REF = Path("/root/reference/monai")

# Reference classes that are torch/TRT/ONNX-internal machinery with no meaningful
# TPU analog (documented n/a in networks/utils.py); excluded from the denominator.
TORCH_INTERNAL_SUFFIXES = (
    "Function",  # torch.autograd.Function wrappers (csrc bindings)
)
TORCH_INTERNAL_NAMES = {
    # torch scripting/TRT/quantization plumbing
    "TrtHandle", "TRTWrapper", "CastToFloat", "CastTempType",
}


def ref_public_classes() -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for py in sorted(REF.rglob("*.py")):
        rel = py.relative_to(REF.parent)
        mod = ".".join(rel.with_suffix("").parts)
        if mod.endswith(".__init__"):
            mod = mod[: -len(".__init__")]
        if "/tests/" in str(py) or "_version" in py.name:
            continue
        try:
            tree = ast.parse(py.read_text())
        except SyntaxError:
            continue
        # module-level classes only: nested classes (defined inside functions/other
        # classes) are implementation details, not public API
        names = [n.name for n in tree.body
                 if isinstance(n, ast.ClassDef) and not n.name.startswith("_")]
        if names:
            out[mod] = sorted(set(names))
    return out


def try_resolve(name: str, ref_mod: str) -> bool:
    candidates = []
    parts = ref_mod.split(".")  # ['monai', 'data', 'dataset'] etc.
    sub = parts[1:]  # drop 'monai'
    # mirrored path and every ancestor package
    for i in range(len(sub), -1, -1):
        candidates.append("monai_tpu" + ("." + ".".join(sub[:i]) if sub[:i] else ""))
    for modname in candidates:
        try:
            m = importlib.import_module(modname)
        except Exception:
            continue
        if hasattr(m, name):
            return True
    return False


def main() -> None:
    classes = ref_public_classes()
    total = resolved = 0
    missing: dict[str, list[str]] = {}
    seen: set[str] = set()
    for mod, names in classes.items():
        for name in names:
            if name in seen:
                continue
            seen.add(name)
            if name in TORCH_INTERNAL_NAMES or any(
                    name.endswith(s) and "autograd" in Path(
                        REF / Path(*mod.split(".")[1:]).with_suffix(".py")
                    ).read_text()[:2000]
                    for s in TORCH_INTERNAL_SUFFIXES):
                continue
            total += 1
            if try_resolve(name, mod):
                resolved += 1
            else:
                missing.setdefault(mod, []).append(name)
    print(json.dumps({"total": total, "resolved": resolved,
                      "pct": round(100.0 * resolved / total, 1)}))
    for mod in sorted(missing):
        print(f"  {mod}: {', '.join(sorted(missing[mod]))}")


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
