"""Mixed-precision training contract (reference analog: amp=True in
monai/engines/trainer.py:194-278 via torch.autocast).

On TPU the failure mode is silent: casting only the *input* to bf16 does
nothing, because JAX type promotion widens activations back to f32 at the first
f32-weight convolution — every conv then runs at the f32 MXU rate (~8x slower,
measured in scripts/perf_train_bisect.py).  These tests pin the contract at the
HLO level so it cannot regress quietly."""
import re

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from monai_tpu.losses import DiceCELoss
from monai_tpu.networks.nets import UNet
from monai_tpu.networks.utils import amp_model_view, cast_params_to_compute


def _tiny_unet():
    return UNet(spatial_dims=3, in_channels=1, out_channels=2, channels=(4, 8, 16),
                strides=(2, 2), num_res_units=1, rngs=nnx.Rngs(0))


def _conv_result_dtypes(hlo_text):
    dts = []
    for line in hlo_text.splitlines():
        if "stablehlo.convolution" in line:
            m = re.search(r"-> tensor<[0-9x]*x(f32|bf16|f16)>", line)
            if m:
                dts.append(m.group(1))
    return dts


class TestCastParams:
    def test_floating_only(self):
        tree = {"w": jnp.ones((2, 2), jnp.float32), "i": jnp.arange(3),
                "k": jax.random.key_data(jax.random.key(0))}
        out = cast_params_to_compute(tree)
        assert out["w"].dtype == jnp.bfloat16
        assert out["i"].dtype == tree["i"].dtype
        assert out["k"].dtype == tree["k"].dtype

    def test_amp_view_forward_is_bf16_convs(self):
        net = _tiny_unet()
        gd, params, rest = nnx.split(net, nnx.Param, ...)

        def fwd(p, x):
            p16 = cast_params_to_compute(p)
            return nnx.merge(gd, p16, rest)(x)

        hlo = jax.jit(fwd).lower(
            params, jax.ShapeDtypeStruct((1, 1, 16, 16, 16), jnp.bfloat16)).as_text()
        dts = _conv_result_dtypes(hlo)
        assert dts and all(d == "bf16" for d in dts), dts

    def test_input_only_cast_promotes_to_f32(self):
        # the trap this module exists to avoid: document that it is real
        net = _tiny_unet()
        gd, params, rest = nnx.split(net, nnx.Param, ...)
        hlo = jax.jit(lambda p, x: nnx.merge(gd, p, rest)(x)).lower(
            params, jax.ShapeDtypeStruct((1, 1, 16, 16, 16), jnp.bfloat16)).as_text()
        dts = _conv_result_dtypes(hlo)
        assert dts and all(d == "f32" for d in dts), dts

    def test_grads_flow_f32_through_cast(self):
        net = _tiny_unet()
        gd, params, rest = nnx.split(net, nnx.Param, ...)
        loss_fn = DiceCELoss(to_onehot_y=True, softmax=True)
        x = jax.random.uniform(jax.random.key(0), (1, 1, 16, 16, 16))
        y = (jax.random.uniform(jax.random.key(1), (1, 1, 16, 16, 16)) > 0.5).astype(jnp.float32)

        def loss(p):
            p16 = cast_params_to_compute(p)
            logits = nnx.merge(gd, p16, rest)(x.astype(jnp.bfloat16)).astype(jnp.float32)
            return loss_fn(logits, y)

        l, g = jax.value_and_grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(a.dtype == jnp.float32 for a in leaves)
        assert np.isfinite(float(l))
        assert any(float(jnp.abs(a).max()) > 0 for a in leaves)

    def test_amp_model_view(self):
        net = _tiny_unet()
        view = amp_model_view(net)
        y = view(jnp.zeros((1, 1, 16, 16, 16), jnp.bfloat16))
        assert y.dtype == jnp.bfloat16
        # original model unchanged (f32 master intact)
        _, state = nnx.split(net)
        assert all(a.dtype == jnp.float32 for a in jax.tree_util.tree_leaves(state)
                   if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating))


class TestTrainerAMP:
    def test_supervised_trainer_amp_trains_and_keeps_f32_master(self):
        from monai_tpu.data import DataLoader, Dataset
        from monai_tpu.engines import SupervisedTrainer

        rng = np.random.RandomState(0)
        data = [{"image": rng.rand(1, 8, 8, 8).astype(np.float32),
                 "label": (rng.rand(1, 8, 8, 8) > 0.5).astype(np.float32)} for _ in range(2)]
        loader = DataLoader(Dataset(data), batch_size=2)
        net = _tiny_unet()
        trainer = SupervisedTrainer(
            max_epochs=1, train_data_loader=loader, network=net,
            optimizer=optax.adam(1e-3), loss_function=DiceCELoss(to_onehot_y=True, softmax=True),
            prepare_batch=lambda b, d, nb: (b["image"], b["label"]), amp=True)
        trainer.run()
        loss = trainer.state.output[0] if isinstance(trainer.state.output, tuple) else trainer.state.output
        _, state = nnx.split(net)
        floats = [a for a in jax.tree_util.tree_leaves(state)
                  if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)]
        assert floats and all(a.dtype == jnp.float32 for a in floats)
