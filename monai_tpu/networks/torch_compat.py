"""Load reference (torch MONAI) checkpoints into monai_tpu networks.

The north-star parity requirement (BASELINE.md) is that a reference-trained model
produce the same outputs here. These helpers convert torch ``state_dict`` tensors
into the channel-last nnx parameter layout:

- Conv{1,2,3}d weight (O, I, *K)        -> nnx.Conv kernel (*K, I, O)
- ConvTranspose{1,2,3}d weight (I, O, *K) -> nnx.ConvTranspose kernel (*K, I, O),
  spatially flipped (lax.conv_transpose correlates where torch's transposed conv
  convolves; verified exact vs torch in tests/test_reference_parity.py)
- PReLU weight -> PReLU.alpha
- Linear weight (O, I) -> nnx.Linear kernel (I, O)

``load_torch_unet_state`` maps the reference UNet's nested Sequential naming
(monai/networks/nets/unet.py:27) onto this package's UNet attribute structure.
"""
from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np
from flax import nnx

__all__ = ["conv_kernel_from_torch", "convtrans_kernel_from_torch", "load_torch_unet_state",
           "load_torch_swin_state"]


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def conv_kernel_from_torch(w) -> np.ndarray:
    """torch Conv Nd weight (O, I, *K) -> flax kernel (*K, I, O)."""
    w = _np(w)
    nsp = w.ndim - 2
    return np.transpose(w, tuple(range(2, 2 + nsp)) + (1, 0))


def convtrans_kernel_from_torch(w) -> np.ndarray:
    """torch ConvTranspose Nd weight (I, O, *K) -> flax kernel (*K, I, O), flipped."""
    w = _np(w)
    nsp = w.ndim - 2
    k = np.transpose(w, tuple(range(2, 2 + nsp)) + (0, 1))
    return np.flip(k, axis=tuple(range(nsp))).copy()


def _set_conv(conv_mod, leaf: str, value: np.ndarray) -> None:
    if leaf == "weight":
        fn = convtrans_kernel_from_torch if isinstance(conv_mod, nnx.ConvTranspose) \
            else conv_kernel_from_torch
        conv_mod.kernel.value = jnp.asarray(fn(value))
    elif leaf == "bias":
        conv_mod.bias.value = jnp.asarray(_np(value))
    else:
        raise KeyError(f"unsupported conv leaf '{leaf}'")


def _set_adn(convolution, adn_leaf: list[str], value: np.ndarray) -> None:
    """Assign into a Convolution's adn list: 'A' -> PReLU alpha, 'N' -> norm params."""
    from .layers.factories import PReLU

    kind, leaf = adn_leaf[0], adn_leaf[-1]
    for op in convolution.adn:
        if kind == "A" and isinstance(op, PReLU):
            op.alpha.value = jnp.asarray(_np(value).reshape(-1))
            return
        if kind == "N" and hasattr(op, "scale"):
            target = op.scale if leaf == "weight" else op.bias
            target.value = jnp.asarray(_np(value))
            return
    raise KeyError(f"no adn op of kind '{kind}' with parameters found")


def load_torch_unet_state(net, state_dict: Mapping[str, Any]) -> None:
    """Copy a reference MONAI UNet ``state_dict`` into a monai_tpu UNet in place.

    Reference layout: model = Sequential(down, SkipConnection(submodule), up),
    recursively; ResidualUnit holds conv.unitN subunits + residual conv; the up
    layer with num_res_units>0 is Sequential(Convolution, ResidualUnit).
    """
    for key, tensor in state_dict.items():
        _assign_unet_key(net, key.split("."), tensor)


def _assign_unet_key(net, toks: list[str], tensor) -> None:
    obj: Any = net
    i = 0
    while i < len(toks):
        t = toks[i]
        if t == "model":
            obj = obj.model
        elif hasattr(obj, "down") and t in ("0", "1", "2"):
            obj = (obj.down, obj.skip, obj.up)[int(t)]
        elif t == "submodule":
            obj = obj.submodule
        elif hasattr(obj, "mods") and t.isdigit():
            obj = obj.mods[int(t)]
        elif t == "conv" and i + 1 < len(toks) and toks[i + 1].startswith("unit"):
            obj = obj.convs[int(toks[i + 1][4:])]
            i += 1
        elif t == "conv":
            if toks[i + 1] in ("weight", "bias"):
                _set_conv(obj.conv, toks[i + 1], tensor)
                return
            obj = obj.conv
        elif t == "residual":
            _set_conv(obj.residual, toks[i + 1], tensor)
            return
        elif t == "adn":
            _set_adn(obj, toks[i + 1:], tensor)
            return
        elif t in ("weight", "bias"):
            _set_conv(obj, t, tensor)
            return
        else:
            raise KeyError(f"cannot map reference key token '{t}' in {'.'.join(toks)}")
        i += 1
    raise KeyError(f"reference key did not terminate at a parameter: {'.'.join(toks)}")


def load_torch_swin_state(net, state_dict: Mapping[str, Any]) -> None:
    """Copy a reference MONAI SwinUNETR ``state_dict`` into a monai_tpu SwinUNETR
    in place (reference layout: monai/networks/nets/swin_unetr.py:45 — swinViT
    with layers1..layers4 ModuleLists of one BasicLayer each, UnetrBasic/Up
    decoder blocks whose convs are Convolution wrappers with a ``.conv`` child).

    Layout conversions: torch Linear weight (O, I) -> nnx kernel (I, O); torch
    LayerNorm/InstanceNorm weight -> scale; Conv/ConvTranspose via the kernel
    converters above. ``relative_position_index`` buffers are copied too so the
    bias gather order is the reference's, not merely equivalent."""
    for key, tensor in state_dict.items():
        _assign_swin_key(net, key.split("."), tensor)


def _assign_swin_key(net, toks: list[str], tensor) -> None:
    from .layers.fast_norm import InstanceNormTPU

    obj: Any = net
    i = 0
    while i < len(toks):
        t = toks[i]
        is_leaf = i == len(toks) - 1
        if is_leaf:
            _assign_swin_leaf(obj, t, tensor, toks)
            return
        if t.startswith("layers") and t[6:].isdigit():
            obj = obj.layers[int(t[6:]) - 1]
            # reference wraps each BasicLayer in a one-element ModuleList
            if i + 1 < len(toks) and toks[i + 1] == "0":
                i += 1
        elif t == "conv" and isinstance(obj, (nnx.Conv, nnx.ConvTranspose)):
            pass  # reference Convolution wrapper level; ours IS the conv
        elif t.isdigit():
            obj = obj[int(t)]
        elif isinstance(obj, InstanceNormTPU) or isinstance(obj, nnx.LayerNorm):
            raise KeyError(f"unexpected token '{t}' under a norm in {'.'.join(toks)}")
        else:
            obj = getattr(obj, t)
        i += 1


def _assign_swin_leaf(obj, leaf: str, tensor, toks: list[str]) -> None:
    from .layers.fast_norm import InstanceNormTPU

    arr = _np(tensor)
    if isinstance(obj, nnx.ConvTranspose):
        _set_conv(obj, leaf, tensor)
    elif isinstance(obj, nnx.Conv):
        _set_conv(obj, leaf, tensor)
    elif isinstance(obj, nnx.Linear):
        if leaf == "weight":
            obj.kernel.value = jnp.asarray(arr.T)
        elif leaf == "bias":
            obj.bias.value = jnp.asarray(arr)
        else:
            raise KeyError(f"unsupported Linear leaf '{leaf}' in {'.'.join(toks)}")
    elif isinstance(obj, nnx.LayerNorm):
        if leaf == "weight":
            obj.scale.value = jnp.asarray(arr)
        elif leaf == "bias":
            obj.bias.value = jnp.asarray(arr)
        else:
            raise KeyError(f"unsupported LayerNorm leaf '{leaf}' in {'.'.join(toks)}")
    elif isinstance(obj, InstanceNormTPU):
        target = obj.scale if leaf == "weight" else obj.bias
        target.value = jnp.asarray(arr)
    elif leaf == "relative_position_bias_table":
        obj.relative_position_bias_table.value = jnp.asarray(arr)
    elif leaf == "relative_position_index":
        obj.relative_position_index.value = jnp.asarray(arr.astype(np.int32))
    else:
        raise KeyError(f"cannot assign leaf '{leaf}' on {type(obj).__name__} "
                       f"({'.'.join(toks)})")
