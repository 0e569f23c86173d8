"""Data layer tests: NIfTI IO, collate/decollate, datasets, loaders, partitioning."""
import os
import tempfile

import numpy as np
import pytest

import monai_tpu.transforms as T
from monai_tpu.data import (
    CacheDataset,
    DataLoader,
    Dataset,
    MetaImage,
    ThreadDataLoader,
    create_test_image_3d,
    decollate_batch,
    dense_patch_slices,
    list_data_collate,
    partition_dataset,
    partition_dataset_classes,
    read_nifti,
    write_nifti,
)


@pytest.fixture(scope="module")
def nifti_files():
    rs = np.random.RandomState(0)
    img, seg = create_test_image_3d(48, 48, 48, rad_max=12, random_state=rs)
    tmpdir = tempfile.mkdtemp()
    img_p = os.path.join(tmpdir, "img.nii.gz")
    seg_p = os.path.join(tmpdir, "seg.nii.gz")
    aff = np.diag([1.2, 1.2, 2.0, 1.0])
    write_nifti(img, img_p, affine=aff)
    write_nifti(seg, seg_p, affine=aff)
    return img, seg, img_p, seg_p, aff


def test_nifti_roundtrip(nifti_files):
    img, _, img_p, _, aff = nifti_files
    arr, meta = read_nifti(img_p)
    np.testing.assert_allclose(arr, img, atol=1e-6)
    np.testing.assert_allclose(meta["affine"], aff, atol=1e-5)


def test_nifti_dtypes(tmp_path):
    for dtype in (np.uint8, np.int16, np.int32, np.float32, np.float64):
        arr = (np.random.rand(5, 6, 7) * 100).astype(dtype)
        p = str(tmp_path / f"x_{np.dtype(dtype).name}.nii")
        write_nifti(arr, p)
        back, _ = read_nifti(p)
        np.testing.assert_allclose(back, arr)


def test_pipeline_and_collate(nifti_files):
    _, _, img_p, seg_p, _ = nifti_files
    xform = T.Compose([
        T.LoadImaged(keys=["image", "label"]),
        T.EnsureChannelFirstd(keys=["image", "label"], channel_dim="no_channel"),
        T.Orientationd(keys=["image", "label"], axcodes="RAS"),
        T.ScaleIntensityRanged(keys="image", a_min=0.0, a_max=1.0, b_min=0.0, b_max=1.0, clip=True),
        T.RandCropByPosNegLabeld(keys=["image", "label"], label_key="label",
                                 spatial_size=(24, 24, 24), pos=1, neg=1, num_samples=2),
    ])
    xform.set_random_state(0)
    ds = Dataset([{"image": img_p, "label": seg_p}], xform)
    loader = DataLoader(ds, batch_size=2)
    batch = next(iter(loader))
    assert batch["image"].shape == (2, 1, 24, 24, 24)
    assert batch["image"].is_batch
    samples = decollate_batch(batch)
    assert len(samples) == 2
    assert samples[0]["image"].shape == (1, 24, 24, 24)
    # op stacks survive decollation for invertibility
    assert len(samples[0]["label"].applied_operations) > 0


def test_cache_dataset_equivalent(nifti_files):
    _, _, img_p, seg_p, _ = nifti_files
    xform = T.Compose([
        T.LoadImaged(keys=["image"]),
        T.EnsureChannelFirstd(keys=["image"], channel_dim="no_channel"),
        T.ScaleIntensityd(keys="image"),
    ])
    plain = Dataset([{"image": img_p}], xform)
    cached = CacheDataset([{"image": img_p}], xform, progress=False)
    np.testing.assert_allclose(plain[0]["image"].data, cached[0]["image"].data)


def test_thread_dataloader(nifti_files):
    _, _, img_p, _, _ = nifti_files
    xform = T.Compose([T.LoadImaged(keys=["image"]),
                       T.EnsureChannelFirstd(keys=["image"], channel_dim="no_channel")])
    ds = Dataset([{"image": img_p}] * 4, xform)
    loader = ThreadDataLoader(ds, batch_size=2, num_workers=2, repeats=2)
    batches = list(loader)
    assert len(batches) == 4  # 2 raw batches x 2 repeats


def test_dense_patch_slices():
    slices = dense_patch_slices((10, 10), (5, 5), (5, 5))
    assert len(slices) == 4
    slices = dense_patch_slices((12, 12), (5, 5), (3, 3))
    assert all(s[0].stop <= 12 for s in slices)


def test_partition_dataset():
    data = list(range(10))
    parts = partition_dataset(data, num_partitions=3, even_divisible=True)
    assert len(parts) == 3
    assert all(len(p) == 4 for p in parts)
    parts = partition_dataset(data, ratios=[0.8, 0.2], shuffle=False)
    assert len(parts[0]) == 8 and len(parts[1]) == 2


def test_partition_dataset_classes():
    data = list(range(10))
    classes = [0, 1, 0, 1, 0, 1, 0, 1, 0, 1]
    parts = partition_dataset_classes(data, classes, num_partitions=2, shuffle=False)
    for p in parts:
        cls = [classes[i] for i in p]
        assert cls.count(0) == cls.count(1)


def test_meta_image_arithmetic(rng):
    img = MetaImage(rng.rand(1, 4, 4).astype(np.float32), affine=np.diag([2.0, 2.0, 1.0]))
    out = img * 2 + 1
    assert isinstance(out, MetaImage)
    np.testing.assert_allclose(out.data, img.data * 2 + 1)
    np.testing.assert_allclose(out.affine, img.affine)
    np.testing.assert_allclose(img.pixdim, [2.0, 2.0])
