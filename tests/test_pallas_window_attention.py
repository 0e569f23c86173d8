"""Fused Pallas window attention (ops/pallas_window_attention.py) vs the XLA
materializing formulation, incl. through the SwinUNETR WindowAttention module.

Runs in interpret mode on CPU so the exact kernel code path is exercised in CI.
Reference behavior target: monai/networks/nets/swin_unetr.py:426 WindowAttention.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from monai_tpu.ops import pallas_window_attention as pwa


@pytest.mark.parametrize("with_mask", [False, True])
def test_fused_matches_xla(with_mask):
    rng = np.random.RandomState(0)
    B, H, N, D, NW = 12, 3, 27, 8, 4
    q, k, v = (jnp.asarray(rng.randn(B, H, N, D).astype(np.float32)) for _ in range(3))
    bias = jnp.asarray(rng.randn(H, N, N).astype(np.float32)) * 0.1
    mask = jnp.asarray((rng.rand(NW, N, N) > 0.5).astype(np.float32)) * -100.0 if with_mask else None
    out = pwa.fused_window_attention(q, k, v, bias, mask)
    ref = pwa._xla_window_attention(q, k, v, bias, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_grads_match_xla():
    rng = np.random.RandomState(1)
    B, H, N, D, NW = 8, 2, 9, 4, 4
    q, k, v = (jnp.asarray(rng.randn(B, H, N, D).astype(np.float32)) for _ in range(3))
    bias = jnp.asarray(rng.randn(H, N, N).astype(np.float32)) * 0.1
    mask = jnp.zeros((NW, N, N), jnp.float32)

    g1 = jax.grad(lambda q: jnp.sum(pwa.fused_window_attention(q, k, v, bias, mask) ** 2))(q)
    g2 = jax.grad(lambda q: jnp.sum(pwa._xla_window_attention(q, k, v, bias, mask) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_wb_divides_mask_groups():
    # wb must divide nW so each block's mask rows are one contiguous slice
    assert pwa._pick_wb(b=6174, nw=343, n=343) in (1, 7, 49)
    assert 343 % pwa._pick_wb(6174, 343, 343) == 0
    assert pwa._pick_wb(b=128, nw=1, n=343) == 1
    wb = pwa._pick_wb(b=384, nw=64, n=343)
    assert 64 % wb == 0 and 384 % wb == 0


def test_swin_window_attention_module_kernel_path(monkeypatch):
    """WindowAttention produces identical output with the kernel forced on."""
    from monai_tpu.networks.nets.swin_unetr import WindowAttention

    attn = WindowAttention(dim=24, num_heads=3, window_size=(3, 3, 3), qkv_bias=True,
                           rngs=nnx.Rngs(0))
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(8, 27, 24).astype(np.float32))
    mask = jnp.zeros((4, 27, 27), jnp.float32)
    ref = attn(x, mask)
    monkeypatch.setattr(pwa, "use_pallas_window_attention", lambda: True)
    out = attn(x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
