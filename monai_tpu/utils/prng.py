"""PRNG utilities bridging MONAI's per-transform numpy RandomState model and JAX keys.

The reference threads a ``np.random.RandomState`` through every ``Randomizable``
(monai/transforms/transform.py:183).  Host-side parameter randomization stays numpy
(deterministic, cheap, works in data workers); device-side sampling uses jax PRNG keys.
These helpers convert between the two worlds.
"""
from __future__ import annotations

import jax
import numpy as np

MAX_SEED = np.iinfo(np.uint32).max + 1  # same bound as the reference (transform.py:52)


def derive_seed(state: np.random.RandomState) -> int:
    """Draw a fresh 32-bit seed from a numpy RandomState."""
    return int(state.randint(MAX_SEED, dtype="uint32"))


def key_from_state(state: np.random.RandomState) -> jax.Array:
    """Make a jax PRNG key driven by a numpy RandomState (host-side determinism)."""
    return jax.random.PRNGKey(derive_seed(state))


def split_keys(key: jax.Array, n: int):
    return list(jax.random.split(key, n))


def fold_in_index(key: jax.Array, index: int) -> jax.Array:
    return jax.random.fold_in(key, index)
