"""Reproduce the SwinUNETR Pallas-vs-XLA-vs-torch parity numbers quoted in
tests/test_swinunetr_parity.py (TestSwinUNETRPallasParity docstring).

Ports reference torch weights into our SwinUNETR, runs the full net on real
TPU three ways — Pallas window attention, default XLA attention, and XLA at
highest matmul precision — and prints max|diff| against the live torch
reference (reference: monai/networks/nets/swin_unetr.py:45).

Run on a chip (axon tunnel): python scripts/perf_pallas_vs_xla.py

Measured on v5e (2026-08-19):
  pallas vs torch:    0.0264
  xla(tpu) vs torch:  0.0251
  pallas vs xla(tpu): 0.0123
  xla highest-precision vs torch: 6.6e-5
i.e. the deviation from torch is the TPU's DEFAULT f32 matmul precision (bf16
MXU passes); the Pallas kernel matches the default XLA path on the same
hardware — neither path is the outlier.
"""
import os
import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference")
from monai.networks.nets import SwinUNETR as RefSwinUNETR  # noqa: E402

sys.path.remove("/root/reference")
sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import nnx  # noqa: E402

from monai_tpu.networks.nets import SwinUNETR  # noqa: E402
from monai_tpu.networks.torch_compat import load_torch_swin_state  # noqa: E402


def main():
    torch.manual_seed(0)
    kwargs = dict(in_channels=1, out_channels=3, feature_size=12, spatial_dims=3)
    ref = RefSwinUNETR(**kwargs).eval()
    ours = SwinUNETR(**kwargs, rngs=nnx.Rngs(0))
    load_torch_swin_state(ours, ref.state_dict())
    x = np.random.RandomState(0).rand(1, 1, 64, 64, 32).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    graphdef, state = nnx.split(ours)
    xj = jnp.asarray(x)

    @jax.jit
    def fwd(state, x):
        return nnx.merge(graphdef, state)(x)

    os.environ["MONAI_TPU_PALLAS_ATTN"] = "1"
    got_pallas = np.asarray(fwd(state, xj))
    jax.clear_caches()
    os.environ["MONAI_TPU_PALLAS_ATTN"] = "0"
    got_xla = np.asarray(fwd(state, xj))
    print("pallas vs torch:", np.abs(got_pallas - want).max())
    print("xla(tpu) vs torch:", np.abs(got_xla - want).max())
    print("pallas vs xla(tpu):", np.abs(got_pallas - got_xla).max())
    with jax.default_matmul_precision("highest"):
        jax.clear_caches()
        got_hi = np.asarray(jax.jit(lambda s, v: nnx.merge(graphdef, s)(v))(state, xj))
    print("xla highest vs torch:", np.abs(got_hi - want).max())


if __name__ == "__main__":
    main()
