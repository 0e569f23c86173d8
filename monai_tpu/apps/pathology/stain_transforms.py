"""H&E stain extraction/normalization (reference: monai/apps/pathology/transforms/stain/
array.py ExtractHEStains / NormalizeHEStains — Macenko method)."""
from __future__ import annotations

import numpy as np

from ...transforms.transform import Transform
from ...utils.backend import to_numpy
from ...utils.type_conversion import convert_to_dst_type

__all__ = ["ExtractHEStains", "NormalizeHEStains"]


class ExtractHEStains(Transform):
    """Estimate the 2-stain matrix via the Macenko method (reference: stain/array.py)."""

    def __init__(self, tli: float = 240, alpha: float = 1, beta: float = 0.15,
                 max_cref=(1.9705, 1.0308)):
        self.tli = tli
        self.alpha = alpha
        self.beta = beta
        self.max_cref = np.asarray(max_cref)

    def _deconvolution_extract_stain(self, image: np.ndarray) -> np.ndarray:
        image = image.astype(np.float64).reshape(-1, 3)
        image = np.clip(image, 1, self.tli)
        absorbance = -np.log(image / self.tli)
        mask = np.all(absorbance > self.beta, axis=1)
        absorbance_hat = absorbance[mask]
        if len(absorbance_hat) == 0:
            raise ValueError("All pixels of the input image are below the absorbance threshold.")
        _, eigvecs = np.linalg.eigh(np.cov(absorbance_hat.T).astype(np.float64))
        t_hat = absorbance_hat @ eigvecs[:, 1:3]
        phi = np.arctan2(t_hat[:, 1], t_hat[:, 0])
        min_phi = np.percentile(phi, self.alpha)
        max_phi = np.percentile(phi, 100 - self.alpha)
        v_min = eigvecs[:, 1:3] @ np.array([(np.cos(min_phi), np.sin(min_phi))]).T
        v_max = eigvecs[:, 1:3] @ np.array([(np.cos(max_phi), np.sin(max_phi))]).T
        if v_min[0] > v_max[0]:
            he = np.array((v_min[:, 0], v_max[:, 0]), dtype=np.float64).T
        else:
            he = np.array((v_max[:, 0], v_min[:, 0]), dtype=np.float64).T
        return he

    def __call__(self, image) -> np.ndarray:
        img = to_numpy(image.data if hasattr(image, "data") and not isinstance(image, np.ndarray) else image)
        if img.ndim == 3 and img.shape[0] == 3:
            img = np.moveaxis(img, 0, -1)
        return self._deconvolution_extract_stain(img)


class NormalizeHEStains(Transform):
    """Normalize to a target stain matrix (reference: stain/array.py NormalizeHEStains)."""

    def __init__(self, tli: float = 240, alpha: float = 1, beta: float = 0.15,
                 target_he=((0.5626, 0.2159), (0.7201, 0.8012), (0.4062, 0.5581)),
                 max_cref=(1.9705, 1.0308)):
        self.tli = tli
        self.target_he = np.asarray(target_he)
        self.max_cref = np.asarray(max_cref)
        self.stain_extractor = ExtractHEStains(tli=tli, alpha=alpha, beta=beta, max_cref=max_cref)

    def __call__(self, image):
        img_in = image
        img = to_numpy(image.data if hasattr(image, "data") and not isinstance(image, np.ndarray) else image)
        chan_first = img.ndim == 3 and img.shape[0] == 3
        if chan_first:
            img = np.moveaxis(img, 0, -1)
        he = self.stain_extractor(img)
        h, w, _ = img.shape
        flat = np.clip(img.reshape(-1, 3).astype(np.float64), 1, self.tli)
        absorbance = -np.log(flat / self.tli)
        conc = np.linalg.lstsq(he, absorbance.T, rcond=None)[0]
        max_conc = np.asarray([np.percentile(conc[0], 99), np.percentile(conc[1], 99)])
        tmp = np.divide(max_conc, self.max_cref)
        conc_norm = np.divide(conc, tmp[:, None])
        image_norm = np.multiply(self.tli, np.exp(-self.target_he @ conc_norm))
        image_norm = np.clip(image_norm, 0, 255).T.reshape(h, w, 3).astype(np.uint8)
        if chan_first:
            image_norm = np.moveaxis(image_norm, -1, 0)
        out, *_ = convert_to_dst_type(image_norm, img_in if isinstance(img_in, np.ndarray) else img)
        return out
