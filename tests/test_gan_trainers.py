"""GanTrainer / AdversarialTrainer end-to-end runs on tiny synthetic data
(reference: monai/engines/trainer.py:281 GanTrainer, :470 AdversarialTrainer;
tests/engines/test_integration_gan in the reference suite)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import nnx

from monai_tpu.engines import AdversarialTrainer, GanTrainer


class _G(nnx.Module):
    def __init__(self):
        rngs = nnx.Rngs(0)
        self.l1 = nnx.Linear(8, 32, rngs=rngs)
        self.l2 = nnx.Linear(32, 16, rngs=rngs)

    def __call__(self, z):
        return jnp.tanh(self.l2(nnx.relu(self.l1(z))))


class _D(nnx.Module):
    def __init__(self):
        rngs = nnx.Rngs(1)
        self.l1 = nnx.Linear(16, 32, rngs=rngs)
        self.l2 = nnx.Linear(32, 1, rngs=rngs)

    def __call__(self, x):
        return self.l2(nnx.relu(self.l1(x)))


class _AE(nnx.Module):
    def __init__(self):
        rngs = nnx.Rngs(2)
        self.enc = nnx.Linear(16, 8, rngs=rngs)
        self.dec = nnx.Linear(8, 16, rngs=rngs)

    def __call__(self, x):
        return self.dec(nnx.relu(self.enc(x)))


def _data(n=3):
    rng = np.random.RandomState(0)
    return [rng.rand(4, 16).astype(np.float32) for _ in range(n)]


def test_gan_trainer_runs():
    import optax

    g, d = _G(), _D()

    def d_loss(d_net, fakes, reals):
        # non-saturating GAN loss on logits
        real_logit = d_net(reals)
        fake_logit = d_net(fakes)
        return (jnp.mean(jax.nn.softplus(-real_logit))
                + jnp.mean(jax.nn.softplus(fake_logit)))

    def g_loss(d_net, fakes):
        return jnp.mean(jax.nn.softplus(-d_net(fakes)))

    def make_latent(batch_size, latent_size):
        return np.random.RandomState(42).rand(batch_size, latent_size).astype(np.float32)

    trainer = GanTrainer(
        max_epochs=2, train_data_loader=_data(), g_network=g,
        g_optimizer=optax.adam(1e-3), g_loss_function=g_loss,
        d_network=d, d_optimizer=optax.adam(1e-3), d_loss_function=d_loss,
        latent_shape=8, d_train_steps=2, g_prepare_batch=make_latent, decollate=False)
    trainer.run()
    out = trainer.state.output
    assert np.isfinite(float(np.asarray(out["g_loss"])))
    assert np.isfinite(float(np.asarray(out["d_loss"])))
    assert out["fakes"].shape == (4, 16)


def test_adversarial_trainer_runs():
    import optax

    from monai_tpu.losses import PatchAdversarialLoss

    ae, d = _AE(), _D()
    adv_loss = PatchAdversarialLoss(criterion="least_squares")

    def recon_loss(pred, target):
        return jnp.mean((pred - target) ** 2)

    def prep(batchdata, device=None, non_blocking=False, **kw):
        x = jnp.asarray(batchdata)
        return x, x  # autoencode: input == target

    trainer = AdversarialTrainer(
        max_epochs=2, train_data_loader=_data(), g_network=ae,
        g_optimizer=optax.adam(1e-3), g_loss_function=adv_loss,
        recon_loss_function=recon_loss, d_network=d,
        d_optimizer=optax.adam(1e-3), d_loss_function=adv_loss,
        prepare_batch=prep, adversarial_weight=0.1, decollate=False)
    trainer.run()
    out = trainer.state.output
    assert any(np.isfinite(float(np.asarray(v))) for k, v in out.items()
               if hasattr(v, "shape") and np.asarray(v).size == 1)
