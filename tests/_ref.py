"""Shared helper: import the PyTorch reference MONAI (from /root/reference) for
live golden-parity tests. Mirrors tests/test_reference_parity_losses.py's loader.

Reference: /root/reference/tests/test_utils.py:99 (assert_allclose) — the parity
harness pattern this replicates in JAX.
"""
import sys

import numpy as np

try:
    import torch
except Exception:  # pragma: no cover - torch is baked into this image
    torch = None

REF = None
if torch is not None:
    sys.path.insert(0, "/root/reference")
    try:
        import monai as _ref_monai
        import monai.transforms  # noqa: F401  (eager submodule load)

        REF = _ref_monai
    except Exception:
        REF = None
    finally:
        if "/root/reference" in sys.path:
            sys.path.remove("/root/reference")


def to_np(x):
    """Convert ours-or-reference output (jnp / MetaImage / torch / MetaTensor) to numpy."""
    if torch is not None and isinstance(x, torch.Tensor):
        return x.detach().cpu().numpy()
    if hasattr(x, "data") and not isinstance(x, np.ndarray):
        try:
            return np.asarray(x.data)
        except Exception:
            pass
    return np.asarray(x)


def allclose(ours, ref, atol=1e-4, rtol=1e-4, msg=""):
    a, b = to_np(ours), to_np(ref)
    assert a.shape == tuple(b.shape), f"{msg}: shape {a.shape} vs {tuple(b.shape)}"
    np.testing.assert_allclose(a.astype(np.float64), b.astype(np.float64),
                               atol=atol, rtol=rtol, err_msg=msg)
