"""Gaussian mixture model for interactive segmentation.

Replaces the reference's JIT-compiled CUDA GMM (monai/_extensions/gmm/gmm_cuda.cu,
bound via monai/networks/layers/gmm.py:21) with a pure-jax EM implementation — dense
matmul/reduction EM iterations that map directly onto the MXU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["GaussianMixtureModel"]


class GaussianMixtureModel:
    """Per-class GMM fit + apply (reference: gmm.py:21).

    features: (B, F, N) feature vectors; labels: (B, N) int labels in [-1, mixture_count)
    where -1 = unlabeled.
    """

    def __init__(self, channel_count: int, mixture_count: int, mixture_size: int,
                 verbose_build: bool = False):
        self.channel_count = channel_count
        self.mixture_count = mixture_count
        self.mixture_size = mixture_size
        self.params = None

    def _fit_single(self, feats, labels, n_iter: int = 10):
        """EM fit of per-class mixtures. feats: (F, N); labels: (N,)."""
        F, N = feats.shape
        K = self.mixture_count
        M = self.mixture_size
        eps = 1e-6

        # responsibilities init: hard assign by label, subcomponents by feature quantile
        def init_class(c):
            mask = (labels == c).astype(feats.dtype)  # (N,)
            count = jnp.maximum(mask.sum(), 1.0)
            mean = (feats * mask).sum(axis=1) / count
            # jitter M subcomponent means around the class mean
            offsets = jnp.linspace(-1.0, 1.0, M)[:, None]
            std = jnp.sqrt(((feats - mean[:, None]) ** 2 * mask).sum(axis=1) / count + eps)
            means = mean[None] + offsets * std[None]  # (M, F)
            covs = jnp.tile(jnp.diag(std**2 + eps)[None], (M, 1, 1))
            weights = jnp.full((M,), 1.0 / M)
            return means, covs, weights

        means = jnp.stack([init_class(c)[0] for c in range(K)])  # (K, M, F)
        covs = jnp.stack([init_class(c)[1] for c in range(K)])  # (K, M, F, F)
        weights = jnp.stack([init_class(c)[2] for c in range(K)])  # (K, M)

        def log_gauss(x, mean, cov):
            # x: (N, F); mean: (F,); cov: (F, F)
            diff = x - mean[None]
            cov_r = cov + eps * jnp.eye(cov.shape[0], dtype=cov.dtype)
            sol = jnp.linalg.solve(cov_r, diff.T).T
            maha = (diff * sol).sum(axis=1)
            _, logdet = jnp.linalg.slogdet(cov_r)
            return -0.5 * (maha + logdet + cov.shape[0] * jnp.log(2 * jnp.pi))

        x = feats.T  # (N, F)

        def em_step(carry, _):
            means, covs, weights = carry
            new_means, new_covs, new_weights = [], [], []
            for c in range(K):
                mask = (labels == c).astype(feats.dtype)
                logp = jnp.stack([log_gauss(x, means[c, m], covs[c, m]) +
                                  jnp.log(weights[c, m] + eps) for m in range(M)])  # (M, N)
                resp = jax.nn.softmax(logp, axis=0) * mask[None]
                nk = resp.sum(axis=1) + eps  # (M,)
                mu = (resp @ x) / nk[:, None]  # (M, F)
                diffs = x[None] - mu[:, None]  # (M, N, F)
                cov = jnp.einsum("mn,mnf,mng->mfg", resp, diffs, diffs) / nk[:, None, None]
                cov = cov + eps * jnp.eye(F)[None]
                new_means.append(mu)
                new_covs.append(cov)
                new_weights.append(nk / nk.sum())
            return (jnp.stack(new_means), jnp.stack(new_covs), jnp.stack(new_weights)), None

        (means, covs, weights), _ = jax.lax.scan(em_step, (means, covs, weights), None, length=n_iter)
        return means, covs, weights

    def learn(self, features, labels, n_iter: int = 10) -> None:
        """Fit the mixtures (reference: gmm.py learn)."""
        features = jnp.asarray(features)
        labels = jnp.asarray(labels)
        self.params = jax.vmap(lambda f, l: self._fit_single(f, l, n_iter))(features, labels)

    def apply(self, features):
        """Per-class posterior probabilities (reference: gmm.py apply)."""
        if self.params is None:
            raise RuntimeError("GMM must be fit with learn() before apply().")
        features = jnp.asarray(features)
        means, covs, weights = self.params
        eps = 1e-6
        K, M = self.mixture_count, self.mixture_size

        def apply_single(feats, means_b, covs_b, weights_b):
            x = feats.T  # (N, F)
            F = x.shape[1]
            outs = []
            for c in range(K):
                comp = []
                for m in range(M):
                    cov_r = covs_b[c, m] + eps * jnp.eye(F)
                    diff = x - means_b[c, m][None]
                    sol = jnp.linalg.solve(cov_r, diff.T).T
                    maha = (diff * sol).sum(axis=1)
                    _, logdet = jnp.linalg.slogdet(cov_r)
                    comp.append(jnp.log(weights_b[c, m] + eps) - 0.5 * (maha + logdet))
                outs.append(jax.scipy.special.logsumexp(jnp.stack(comp), axis=0))
            logp = jnp.stack(outs)  # (K, N)
            return jax.nn.softmax(logp, axis=0)

        return jax.vmap(apply_single)(features, *self.params)
