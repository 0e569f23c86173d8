"""Real-file WSI path (VERDICT r2 next #10): build an actual pyramidal multi-page
TIFF on disk, read it through WSIReader, drive PatchWSIDataset and a pathology
post-processing chain on the extracted patches.

Reference: monai/data/wsi_reader.py:447, monai/data/wsi_datasets.py:32.
"""
from __future__ import annotations

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

from monai_tpu.data.wsi_datasets import PatchWSIDataset, SlidingPatchWSIDataset
from monai_tpu.data.wsi_reader import WSIReader


def _make_pyramidal_tiff(path, size0=64, levels=3, seed=0):
    """Write a deterministic RGB pyramid: page k is a 2^k-downsampled level."""
    rng = np.random.RandomState(seed)
    base = (rng.rand(size0, size0, 3) * 255).astype(np.uint8)
    pages = []
    for k in range(levels):
        s = size0 >> k
        pages.append(Image.fromarray(base[::size0 // s or 1, ::size0 // s or 1][:s, :s]))
    pages[0].save(str(path), save_all=True, append_images=pages[1:])
    return base


def test_wsireader_reads_pyramid_levels(tmp_path):
    f = tmp_path / "slide.tiff"
    base = _make_pyramidal_tiff(f, size0=64, levels=3)
    reader = WSIReader(backend="pil")
    wsi = reader.read(str(f))
    assert reader.get_level_count(wsi) == 3
    assert reader.get_size(wsi, 0) == (64, 64)
    assert reader.get_size(wsi, 2) == (16, 16)
    # full level-0 read equals the written data
    img, meta = reader.get_data(wsi, level=0)
    assert img.shape == (3, 64, 64)
    np.testing.assert_array_equal(img.transpose(1, 2, 0), base)
    # a patch at level 1, level-0 location convention: location (32, 32) -> (16, 16)
    patch, meta = reader.get_data(wsi, location=(32, 32), size=(8, 8), level=1)
    assert patch.shape == (3, 8, 8)
    np.testing.assert_array_equal(patch.transpose(1, 2, 0), base[::2, ::2][16:24, 16:24])
    assert meta["level"] == 1


def test_patch_wsi_dataset_on_real_file(tmp_path):
    f = tmp_path / "slide.tiff"
    _make_pyramidal_tiff(f, size0=64, levels=2)
    data = [{"image": str(f), "location": [16, 16], "label": 1},
            {"image": str(f), "location": [40, 24], "label": 0}]
    ds = PatchWSIDataset(data, patch_size=8, patch_level=0, reader="pil",
                         center_location=False)
    for i, item in enumerate(ds):
        img = item["image"]
        arr = np.asarray(img.data if hasattr(img, "data") else img)
        assert arr.shape == (3, 8, 8)
        assert float(np.asarray(item["label"]).reshape(-1)[0]) == data[i]["label"]


def test_sliding_patch_wsi_dataset_on_real_file(tmp_path):
    f = tmp_path / "slide.tiff"
    _make_pyramidal_tiff(f, size0=64, levels=2)
    ds = SlidingPatchWSIDataset([{"image": str(f)}], patch_size=32, patch_level=0,
                                reader="pil", overlap=0.0)
    patches = list(ds)
    assert len(patches) == 4  # 64/32 x 64/32
    for item in patches:
        arr = np.asarray(item["image"].data if hasattr(item["image"], "data")
                         else item["image"])
        assert arr.shape == (3, 32, 32)


def test_wsi_patch_through_pathology_postprocessing(tmp_path):
    """Patches from the real file run through the HoVerNet-style post chain."""
    from monai_tpu.apps.pathology import GenerateWatershedMask

    f = tmp_path / "slide.tiff"
    _make_pyramidal_tiff(f, size0=64, levels=2, seed=3)
    ds = PatchWSIDataset([{"image": str(f), "location": [0, 0], "label": 1}],
                         patch_size=32, patch_level=0, reader="pil",
                         center_location=False)
    item = ds[0]
    arr = np.asarray(item["image"].data if hasattr(item["image"], "data")
                     else item["image"]).astype(np.float32) / 255.0
    # two-class prob map from the green channel as a stand-in network output
    prob = np.stack([1 - arr[1:2], arr[1:2]], axis=0)[:, 0]
    mask = GenerateWatershedMask(activation="softmax")(prob)
    assert np.asarray(mask).shape[-2:] == (32, 32)
