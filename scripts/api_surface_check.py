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


def _ref_public_defs(node_type) -> dict[str, list[str]]:
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
        # module-level defs only: nested defs (inside functions/other classes)
        # are implementation details, not public API
        names = [n.name for n in tree.body
                 if isinstance(n, node_type) and not n.name.startswith("_")]
        if names:
            out[mod] = sorted(set(names))
    return out


def ref_public_classes() -> dict[str, list[str]]:
    return _ref_public_defs(ast.ClassDef)


def ref_public_functions() -> dict[str, list[str]]:
    return _ref_public_defs((ast.FunctionDef, ast.AsyncFunctionDef))


# Reference module-level functions with no meaningful TPU analog, excluded from
# the function-gate denominator (VERDICT r3 #7 "documented n/a allowlist").
# Grouped by reason; every entry names the reference location it comes from.
FUNCTION_NA_ALLOWLIST: dict[str, set[str]] = {
    # versioneer build machinery (monai/_version.py is skipped wholesale via
    # FUNCTION_NA_MODULES; monai/__init__.py re-exposes get_versions)
    "monai": {"get_versions"},
    # TensorRT engine plumbing (monai/networks/trt_compiler.py): CUDA-runtime
    # specific; the TPU export path is StableHLO (bundle ckpt_export), and the
    # user-facing trt_compile surface exists as a documented raiser in
    # monai_tpu/networks/trt_compiler.py.
    "monai.networks.trt_compiler": {"cuassert", "get_dynamic_axes", "make_tensor",
                                    "parse_groups", "trt_forward",
                                    "trt_to_torch_dtype_dict", "unroll_input"},
    # torch JIT extension loader (monai/_extensions/loader.py:29,48) — the TPU
    # native path is the prebuilt ctypes library in monai_tpu/ops/native.py.
    "monai._extensions.loader": {"load_module", "timeout"},
}
# modules whose entire function surface is n/a:
FUNCTION_NA_MODULES = (
    "monai._version",          # versioneer
    "monai.utils.tf32",        # CUDA TF32 / Ampere detection
    # docs-image generation script shipped inside the reference package; renders
    # the transform gallery for readthedocs (matplotlib file output, no library
    # behavior). Ref: monai/transforms/utils_create_transform_ims.py:1.
    "monai.transforms.utils_create_transform_ims",
)


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


def function_gate(apply_allowlist: bool = True):
    """Resolve every reference module-level public function from monai_tpu.
    Returns (total, resolved, missing_by_module)."""
    funcs = ref_public_functions()
    total = resolved = 0
    missing: dict[str, list[str]] = {}
    seen: set[str] = set()
    for mod, names in funcs.items():
        if apply_allowlist and mod.startswith(FUNCTION_NA_MODULES):
            continue
        allow = FUNCTION_NA_ALLOWLIST.get(mod, set()) if apply_allowlist else set()
        for name in names:
            if name in allow or (mod, name) in seen:
                continue
            seen.add((mod, name))
            total += 1
            if try_resolve(name, mod):
                resolved += 1
            else:
                missing.setdefault(mod, []).append(name)
    return total, resolved, missing


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

    apply_allow = "--no-allowlist" not in sys.argv
    ftotal, fresolved, fmissing = function_gate(apply_allowlist=apply_allow)
    print(json.dumps({"functions_total": ftotal, "functions_resolved": fresolved,
                      "pct": round(100.0 * fresolved / ftotal, 1),
                      "allowlist_applied": apply_allow}))
    for mod in sorted(fmissing):
        print(f"  {mod}: {', '.join(sorted(fmissing[mod]))}")


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
