"""fastMRI HDF5 reader (reference: monai/apps/reconstruction/fastmri_reader.py:29
FastMRIReader). Uses the bundled h5py."""
from __future__ import annotations

import os
from typing import Any

import numpy as np

from ...utils.enums import FastMRIKeys

__all__ = ["FastMRIReader"]


class FastMRIReader:
    """(reference: fastmri_reader.py:29). Loads .h5 fastMRI files into
    (kspace array, metadata dict)."""

    def verify_suffix(self, filename) -> bool:
        return str(filename).endswith(".h5")

    def read(self, data) -> dict:
        import h5py

        if not os.path.isfile(str(data)):
            raise FileNotFoundError(f"{data} does not exist.")
        with h5py.File(str(data), "r") as f:
            dat = dict(
                [(key, f[key][()]) for key in f]
                + [(key, f.attrs[key]) for key in f.attrs]
            )
        dat[FastMRIKeys.FILENAME] = os.path.basename(str(data))
        return dat

    def get_data(self, dat: dict) -> tuple[np.ndarray, dict]:
        header = self._get_meta_dict(dat)
        data = np.asarray(dat[FastMRIKeys.KSPACE])
        header["spatial_shape"] = np.asarray(data.shape)
        return data, header

    def _get_meta_dict(self, dat: dict) -> dict:
        return {str(k.value if hasattr(k, "value") else k): dat[k]
                for k in FastMRIKeys if k in dat}
