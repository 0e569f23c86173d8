"""Ultrasound confidence map via random walks (Karamalis et al., MedIA 2012)
(reference: monai/data/ultrasound_confidence_map.py:29 UltrasoundConfidenceMap).

Host-side numpy/scipy: the computation is a sparse graph-Laplacian Dirichlet solve,
which belongs on CPU, not the TPU (irregular sparsity). The 8-connected edge list is
built vectorized over shifted views rather than the reference's per-template gather.
"""
from __future__ import annotations

import numpy as np

__all__ = ["UltrasoundConfidenceMap"]


class UltrasoundConfidenceMap:
    """(reference: ultrasound_confidence_map.py:29). ``__call__(data, sink_mask)`` takes an
    (H, W) image (one scanline per column) and returns the (H, W) confidence map."""

    def __init__(self, alpha: float = 2.0, beta: float = 90.0, gamma: float = 0.05,
                 mode: str = "B", sink_mode: str = "all", use_cg: bool = False,
                 cg_tol: float = 1e-6, cg_maxiter: int = 200):
        if mode not in ("B", "RF"):
            raise ValueError("mode must be 'B' or 'RF'")
        if sink_mode not in ("all", "mid", "min", "mask"):
            raise ValueError("sink_mode must be one of all/mid/min/mask")
        self.alpha = alpha
        self.beta = beta
        self.gamma = gamma
        self.mode = mode
        self.sink_mode = sink_mode
        self.use_cg = use_cg
        self.cg_tol = cg_tol
        self.cg_maxiter = cg_maxiter
        self.eps = np.finfo("float64").eps
        self._sink_indices = np.array([], dtype="int32")

    def normalize(self, arr: np.ndarray) -> np.ndarray:
        return (arr - arr.min()) / (np.ptp(arr) + self.eps)

    def attenuation_weighting(self, img: np.ndarray, alpha: float) -> np.ndarray:
        """Beer-Lambert depth attenuation (reference: ucm:169)."""
        dw = np.linspace(0, 1, img.shape[0], dtype="float64")[:, None]
        return 1.0 - np.exp(-alpha * dw)

    def get_seed_and_labels(self, data, sink_mode="all", sink_mask=None):
        """Source seeds on the first row, sinks per sink_mode (reference: ucm:101)."""
        h, w = data.shape
        cols = np.arange(w)
        src = cols * h  # row 0, column-major linear ids
        if sink_mode == "all":
            sr, sc = np.full(w, h - 1), cols
        elif sink_mode == "mid":
            sr, sc = np.array([h - 1]), np.array([w // 2])
        elif sink_mode == "min":
            ten = int(w * 0.1)
            last = data[-1, ten:-ten]
            sc = np.where(last == last.min())[0] + ten
            sr = np.full_like(sc, h - 1)
        else:  # mask
            if sink_mask is None:
                raise ValueError("sink_mask is required when sink_mode='mask'.")
            sr, sc = np.where(np.asarray(sink_mask) != 0)
        self._sink_indices = np.array([sr, sc], dtype="int32")
        snk = np.unique(sr + sc * h)
        seeds = np.concatenate([np.unique(src), snk]).astype(np.int64)
        labels = np.concatenate([np.ones(len(np.unique(src))), np.full(len(snk), 2.0)])
        return seeds, labels

    def _laplacian(self, img: np.ndarray, beta: float, gamma: float):
        """8-connected Laplacian with normalized intensity-difference weights
        (reference: ucm:195 confidence_laplacian)."""
        from scipy.sparse import csc_matrix

        h, w = img.shape
        n = h * w
        ids = (np.arange(n).reshape(w, h).T)  # column-major linear ids laid out as (H, W)
        rows_i, rows_j, vals = [np.arange(n)], [np.arange(n)], [np.zeros(n)]
        # edge template order mirrors the reference: vertical, diagonal, horizontal;
        # gamma is added to everything after the vertical block (diagonal + horizontal)
        templates = [(-1, 0), (1, 0), (-1, 1), (1, 1), (1, -1), (-1, -1), (0, 1), (0, -1)]
        vertical_sizes = 0
        sizes = []
        for dr, dc in templates:
            r0 = slice(max(0, -dr), h - max(0, dr))
            c0 = slice(max(0, -dc), w - max(0, dc))
            r1 = slice(max(0, dr), h - max(0, -dr))
            c1 = slice(max(0, dc), w - max(0, -dc))
            src_ids = ids[r0, c0].ravel()
            dst_ids = ids[r1, c1].ravel()
            wgt = np.abs(img.T.ravel()[src_ids] - img.T.ravel()[dst_ids])
            rows_i.append(src_ids)
            rows_j.append(dst_ids)
            vals.append(wgt)
            sizes.append(len(wgt))
        vertical_sizes = n + sizes[0] + sizes[1]
        i = np.concatenate(rows_i)
        j = np.concatenate(rows_j)
        s = np.concatenate(vals)
        s = self.normalize(s)
        s[vertical_sizes:] += gamma
        s = self.normalize(s)
        s = -(np.exp(-beta * s) + 1e-5)
        lap = csc_matrix((s, (i, j)), shape=(n, n))
        lap.setdiag(0)
        lap.eliminate_zeros()
        diag = np.abs(np.asarray(lap.sum(axis=0)).ravel())
        lap.setdiag(diag)
        return lap

    def _solve(self, lap, rhs):
        from scipy.sparse.linalg import cg, spsolve

        if self.use_cg:
            try:
                x, _ = cg(lap, rhs, rtol=self.cg_tol, maxiter=self.cg_maxiter)
            except TypeError:  # older scipy uses tol=
                x, _ = cg(lap, rhs, tol=self.cg_tol, maxiter=self.cg_maxiter)
            return x
        return spsolve(lap.tocsc(), rhs)

    def confidence_estimation(self, img, seeds, labels, beta, gamma):
        """(reference: ucm:295)."""
        from scipy.sparse import csc_matrix

        h, w = img.shape
        n = h * w
        lap = self._laplacian(img, beta, gamma)
        b = lap[:, seeds]
        i_u = np.setdiff1d(np.arange(n), seeds)
        b = b[i_u, :]
        lap_u = csc_matrix(lap[i_u, :][:, i_u])
        m = (labels == 1).astype("float64")[:, None]
        rhs = np.asarray(-(b @ m)).ravel()
        x = self._solve(lap_u, rhs)
        probabilities = np.zeros(n, dtype="float64")
        probabilities[i_u] = x
        probabilities[seeds[labels == 1]] = 1.0
        return probabilities.reshape(w, h).T

    def __call__(self, data: np.ndarray, sink_mask: np.ndarray | None = None) -> np.ndarray:
        data = self.normalize(np.asarray(data, dtype="float64"))
        if self.mode == "RF":
            from scipy.signal import hilbert

            data = np.abs(hilbert(data, axis=0)).astype("float64")
        seeds, labels = self.get_seed_and_labels(data, self.sink_mode, sink_mask)
        w = self.attenuation_weighting(data, self.alpha)
        data = data * w
        return self.confidence_estimation(data, seeds, labels, self.beta, self.gamma)
