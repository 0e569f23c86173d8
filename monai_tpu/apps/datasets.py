"""Reference datasets: MedNIST / Decathlon / cross-validation.

Parity targets: monai/apps/datasets.py (MedNISTDataset:47, DecathlonDataset:197,
CrossValidation:678).  Downloads are gated (zero-egress environment) — datasets work
from pre-staged local folders.
"""
from __future__ import annotations

import os
import sys
from collections.abc import Callable, Sequence
from pathlib import Path
from typing import Any

import numpy as np

from ..data.dataset import CacheDataset
from ..data.utils import partition_dataset, select_cross_validation_folds
from ..transforms.compose import Compose
from ..transforms.dictionary import LoadImaged
from ..transforms.transform import Randomizable
from ..utils.misc import ensure_tuple
from .utils import download_and_extract, logger

__all__ = ["MedNISTDataset", "DecathlonDataset", "TciaDataset", "CrossValidation", "load_decathlon_datalist",
           "load_decathlon_properties", "make_synthetic_datalist",
           "make_synthetic_classification_datalist", "check_missing_files",
           "create_cross_validation_datalist"]


def load_decathlon_datalist(data_list_file_path: str, is_segmentation: bool = True,
                            data_list_key: str = "training", base_dir: str | None = None) -> list[dict]:
    """Load the Decathlon-style dataset.json datalist
    (reference: monai/data/decathlon_datalist.py:—)."""
    import json

    data_list_file_path_p = Path(data_list_file_path)
    if not data_list_file_path_p.is_file():
        raise ValueError(f"Data list file {data_list_file_path} does not exist.")
    with open(data_list_file_path_p) as json_file:
        json_data = json.load(json_file)
    if data_list_key not in json_data:
        raise ValueError(f'Data list {data_list_key} not specified in "{data_list_file_path}".')
    expected_data = json_data[data_list_key]
    if data_list_key == "test" and not isinstance(expected_data[0], dict):
        expected_data = [{"image": i} for i in expected_data]
    if base_dir is None:
        base_dir = str(data_list_file_path_p.parent)

    def _append_paths(items):
        for item in items:
            for k, v in item.items():
                if isinstance(v, str) and not os.path.isabs(v):
                    item[k] = os.path.normpath(os.path.join(base_dir, v))
        return items

    return _append_paths(expected_data)


def load_decathlon_properties(data_property_file_path: str, property_keys: Sequence[str] | str) -> dict:
    """Load keys from a Decathlon dataset.json (reference: decathlon_datalist.py:—)."""
    import json

    with open(data_property_file_path) as json_file:
        json_data = json.load(json_file)
    properties = {}
    for key in ensure_tuple(property_keys):
        if key not in json_data:
            raise KeyError(f"key {key} is not in the data property file.")
        properties[key] = json_data[key]
    return properties


class MedNISTDataset(Randomizable, CacheDataset):
    """MedNIST 2D classification dataset (reference: apps/datasets.py:47)."""

    resource = "https://github.com/Project-MONAI/MONAI-extra-test-data/releases/download/0.8.1/MedNIST.tar.gz"
    md5 = "0bc7306e7427e00ad1c5526a6677552d"
    compressed_file_name = "MedNIST.tar.gz"
    dataset_folder_name = "MedNIST"

    def __init__(self, root_dir: str, section: str, transform=(), download: bool = False,
                 seed: int = 0, val_frac: float = 0.1, test_frac: float = 0.1, cache_num: int = sys.maxsize,
                 cache_rate: float = 1.0, num_workers: int = 1, progress: bool = True,
                 copy_cache: bool = True, as_contiguous: bool = True, runtime_cache=False):
        root = Path(root_dir)
        if not root.is_dir():
            raise ValueError("Root directory root_dir must be a directory.")
        self.section = section
        self.val_frac = val_frac
        self.test_frac = test_frac
        self.set_random_state(seed=seed)
        tarfile_name = root / self.compressed_file_name
        dataset_dir = root / self.dataset_folder_name
        self.num_class = 0
        if download:
            download_and_extract(self.resource, str(tarfile_name), str(root), self.md5, progress=progress)
        if not dataset_dir.is_dir():
            raise RuntimeError(
                f"Cannot find dataset directory: {dataset_dir}, please use download=True to download it "
                "(requires network) or stage it locally.")
        data = self._generate_data_list(str(dataset_dir))
        if transform == ():
            transform = LoadImaged("image")
        CacheDataset.__init__(self, data=data, transform=transform, cache_num=cache_num,
                              cache_rate=cache_rate, num_workers=num_workers, progress=progress,
                              copy_cache=copy_cache, as_contiguous=as_contiguous,
                              runtime_cache=runtime_cache)

    def randomize(self, data=None) -> None:
        self.rann = self.R.random()

    def get_num_classes(self) -> int:
        return self.num_class

    def _generate_data_list(self, dataset_dir: str) -> list[dict]:
        datadir = Path(dataset_dir)
        class_names = sorted(f"{x.name}" for x in datadir.iterdir() if x.is_dir())
        self.num_class = len(class_names)
        image_files = [[f"{x}" for x in (datadir / class_names[i]).iterdir()]
                       for i in range(self.num_class)]
        num_each = [len(image_files[i]) for i in range(self.num_class)]
        image_files_list = []
        image_class = []
        class_name = []
        for i in range(self.num_class):
            image_files_list.extend(image_files[i])
            image_class.extend([i] * num_each[i])
            class_name.extend([class_names[i]] * num_each[i])

        length = len(image_files_list)
        data: list[dict] = []
        for i in range(length):
            self.randomize()
            if self.section == "training":
                if self.rann < self.val_frac + self.test_frac:
                    continue
            elif self.section == "validation":
                if self.rann >= self.val_frac:
                    continue
            elif self.section == "test":
                if self.rann < self.val_frac or self.rann >= self.val_frac + self.test_frac:
                    continue
            else:
                raise ValueError(
                    f'Unsupported section: {self.section}, available options are ["training", "validation", "test"].')
            data.append({"image": image_files_list[i], "label": image_class[i],
                         "class_name": class_name[i]})
        return data


class DecathlonDataset(Randomizable, CacheDataset):
    """Medical Segmentation Decathlon dataset (reference: apps/datasets.py:197)."""

    resource = {
        "Task01_BrainTumour": "https://msd-for-monai.s3-us-west-2.amazonaws.com/Task01_BrainTumour.tar",
        "Task02_Heart": "https://msd-for-monai.s3-us-west-2.amazonaws.com/Task02_Heart.tar",
        "Task03_Liver": "https://msd-for-monai.s3-us-west-2.amazonaws.com/Task03_Liver.tar",
        "Task04_Hippocampus": "https://msd-for-monai.s3-us-west-2.amazonaws.com/Task04_Hippocampus.tar",
        "Task05_Prostate": "https://msd-for-monai.s3-us-west-2.amazonaws.com/Task05_Prostate.tar",
        "Task06_Lung": "https://msd-for-monai.s3-us-west-2.amazonaws.com/Task06_Lung.tar",
        "Task07_Pancreas": "https://msd-for-monai.s3-us-west-2.amazonaws.com/Task07_Pancreas.tar",
        "Task08_HepaticVessel": "https://msd-for-monai.s3-us-west-2.amazonaws.com/Task08_HepaticVessel.tar",
        "Task09_Spleen": "https://msd-for-monai.s3-us-west-2.amazonaws.com/Task09_Spleen.tar",
        "Task10_Colon": "https://msd-for-monai.s3-us-west-2.amazonaws.com/Task10_Colon.tar",
    }
    md5 = {
        "Task01_BrainTumour": "240a19d752f0d9e9101544901065d872",
        "Task02_Heart": "06ee59366e1e5124267b774dbd654057",
        "Task03_Liver": "a90ec6c4aa7f6a3d087205e23d4e6397",
        "Task04_Hippocampus": "9d24dba78a72977dbd1d2e110310f31b",
        "Task05_Prostate": "35138f08b1efaef89d7424d2bcc928db",
        "Task06_Lung": "8afd997733c7fc0432f71255ba4e52dc",
        "Task07_Pancreas": "4f7080cfca169fa8066d17ce6eb061e4",
        "Task08_HepaticVessel": "641d79e80ec66453921d997fbf12a29c",
        "Task09_Spleen": "410d4a301da4e5b2f6f86ec3ddba524e",
        "Task10_Colon": "bad7a188931dc2f6acf72b08eb6202d0",
    }

    def __init__(self, root_dir: str, task: str, section: str, transform=(), download: bool = False,
                 seed: int = 0, val_frac: float = 0.2, cache_num: int = sys.maxsize,
                 cache_rate: float = 1.0, num_workers: int = 1, progress: bool = True,
                 copy_cache: bool = True, as_contiguous: bool = True, runtime_cache=False):
        root = Path(root_dir)
        if not root.is_dir():
            raise ValueError("Root directory root_dir must be a directory.")
        self.section = section
        self.val_frac = val_frac
        self.set_random_state(seed=seed)
        if task not in self.resource:
            raise ValueError(f"Unsupported task: {task}, available options are: {list(self.resource)}.")
        dataset_dir = root / task
        tarfile_name = f"{dataset_dir}.tar"
        if download:
            download_and_extract(self.resource[task], tarfile_name, str(root), self.md5[task],
                                 progress=progress)
        if not dataset_dir.exists():
            raise RuntimeError(
                f"Cannot find dataset directory: {dataset_dir}, please use download=True or stage it.")
        self.indices: np.ndarray = np.asarray([])
        data = self._generate_data_list(str(dataset_dir))
        property_keys = ["name", "description", "reference", "licence", "tensorImageSize",
                         "modality", "labels", "numTraining", "numTest"]
        self._properties = load_decathlon_properties(str(dataset_dir / "dataset.json"), property_keys)
        if transform == ():
            transform = LoadImaged(["image", "label"])
        CacheDataset.__init__(self, data=data, transform=transform, cache_num=cache_num,
                              cache_rate=cache_rate, num_workers=num_workers, progress=progress,
                              copy_cache=copy_cache, as_contiguous=as_contiguous,
                              runtime_cache=runtime_cache)

    def get_indices(self) -> np.ndarray:
        return self.indices

    def randomize(self, data=None) -> None:
        self.indices = self.R.permutation(data)

    def get_properties(self, keys=None):
        if keys is None:
            return self._properties
        return {k: self._properties[k] for k in ensure_tuple(keys)}

    def _generate_data_list(self, dataset_dir: str) -> list[dict]:
        section = "training" if self.section in ("training", "validation") else "test"
        datalist = load_decathlon_datalist(os.path.join(dataset_dir, "dataset.json"), True, section)
        return self._split_datalist(datalist)

    def _split_datalist(self, datalist: list[dict]) -> list[dict]:
        if self.section == "test":
            return datalist
        length = len(datalist)
        indices = np.arange(length)
        self.randomize(indices)
        val_length = int(length * self.val_frac)
        if self.section == "training":
            self.indices = self.indices[val_length:]
        else:
            self.indices = self.indices[:val_length]
        return [datalist[i] for i in self.indices]


class CrossValidation:
    """K-fold dataset factory (reference: apps/datasets.py:678)."""

    def __init__(self, dataset_cls, nfolds: int = 5, seed: int = 0, **dataset_params):
        if not hasattr(dataset_cls, "_split_datalist"):
            raise ValueError("dataset class must have _split_datalist API.")
        self.dataset_cls = dataset_cls
        self.nfolds = nfolds
        self.seed = seed
        self.dataset_params = dataset_params

    def get_dataset(self, folds: Sequence[int] | int, **dataset_params):
        """Dataset of the selected folds (reference: apps/datasets.py get_dataset)."""
        nfolds = self.nfolds
        seed = self.seed
        dataset_params_ = dict(self.dataset_params)
        dataset_params_.update(dataset_params)

        class _NsplitsDataset(self.dataset_cls):  # type: ignore
            def _split_datalist(self, datalist: list[dict]) -> list[dict]:
                data = partition_dataset(data=datalist, num_partitions=nfolds, shuffle=True, seed=seed)
                return select_cross_validation_folds(partitions=data, folds=folds)

        return _NsplitsDataset(**dataset_params_)


def make_synthetic_datalist(dataset_dir: str, num_images: int = 8, spatial_size=(64, 64, 64),
                            num_seg_classes: int = 1, section_splits=(0.75, 0.25),
                            seed: int = 0, overwrite: bool = False) -> dict:
    """Materialise a synthetic Decathlon-style NIfTI dataset on disk and return a
    datalist dict with 'training'/'validation' sections.

    The bundle configs under ``bundles/`` use this when no real dataset is staged
    (zero-egress fallback; phantom generator: data/synthetic.py, mirroring the
    reference's tests/integration pattern of training on `create_test_image_3d`
    phantoms — /root/reference/tests/integration/test_integration_segmentation_3d.py).
    """
    from ..data.nifti import write_nifti
    from ..data.synthetic import create_test_image_2d, create_test_image_3d

    root = Path(dataset_dir)
    (root / "imagesTr").mkdir(parents=True, exist_ok=True)
    (root / "labelsTr").mkdir(parents=True, exist_ok=True)
    rs = np.random.RandomState(seed)
    items = []
    for i in range(num_images):
        img_p = str(root / "imagesTr" / f"img{i:03d}.nii.gz")
        seg_p = str(root / "labelsTr" / f"seg{i:03d}.nii.gz")
        if overwrite or not (os.path.exists(img_p) and os.path.exists(seg_p)):
            rad_max = max(3, min(spatial_size) // 3)
            maker = create_test_image_3d if len(spatial_size) == 3 else create_test_image_2d
            im, seg = maker(*spatial_size, num_objs=4, rad_max=rad_max,
                            num_seg_classes=num_seg_classes, random_state=rs)
            write_nifti(im.astype(np.float32), img_p)
            write_nifti(seg.astype(np.uint8), seg_p)
        items.append({"image": img_p, "label": seg_p})
    n_train = max(1, int(round(section_splits[0] * num_images)))
    return {"training": items[:n_train], "validation": items[n_train:] or items[-1:]}


def make_synthetic_classification_datalist(dataset_dir: str, num_images: int = 32,
                                           spatial_size=(64, 64), num_classes: int = 3,
                                           seed: int = 0, overwrite: bool = False) -> dict:
    """MedNIST-style synthetic 2D classification set: images whose class label is the
    number of blobs drawn; returns 'training'/'validation' items of
    {'image': path, 'label': int}."""
    from ..data.nifti import write_nifti
    from ..data.synthetic import create_test_image_2d

    root = Path(dataset_dir)
    root.mkdir(parents=True, exist_ok=True)
    rs = np.random.RandomState(seed)
    items = []
    for i in range(num_images):
        cls = int(i % num_classes)
        img_p = str(root / f"img{i:03d}_c{cls}.nii.gz")
        if overwrite or not os.path.exists(img_p):
            im, _ = create_test_image_2d(*spatial_size, num_objs=cls + 1, rad_max=10,
                                         rad_min=4, random_state=rs)
            write_nifti(im.astype(np.float32), img_p)
        items.append({"image": img_p, "label": cls})
    n_train = max(1, int(round(0.75 * num_images)))
    return {"training": items[:n_train], "validation": items[n_train:] or items[-1:]}


def check_missing_files(datalist: list, keys, root_dir=None, allow_missing_keys: bool = False):
    """List missing files in a Decathlon datalist (reference:
    data/decathlon_datalist.py:161)."""
    from ..utils.misc import ensure_tuple

    missing_files = []
    for item in datalist:
        for k in ensure_tuple(keys):
            if k not in item:
                if not allow_missing_keys:
                    raise ValueError(f"key `{k}` is missing in the datalist item: {item}")
                continue
            for f in ensure_tuple(item[k]):
                if not isinstance(f, (str, os.PathLike)):
                    raise ValueError(f"filepath of key `{k}` must be a string, got: {f}.")
                p = Path(f)
                if isinstance(root_dir, (str, os.PathLike)):
                    p = Path(root_dir).joinpath(p)
                if not p.exists():
                    missing_files.append(p)
    return missing_files


def create_cross_validation_datalist(datalist: list, nfolds: int, train_folds, val_folds,
                                     train_key: str = "training", val_key: str = "validation",
                                     filename=None, shuffle: bool = True, seed: int = 0,
                                     check_missing: bool = False, keys=None, root_dir=None,
                                     allow_missing_keys: bool = False, raise_error: bool = True):
    """Partition a datalist into a k-fold train/val dict (reference:
    data/decathlon_datalist.py:199)."""
    import json
    import warnings

    from ..data.utils import partition_dataset, select_cross_validation_folds

    if check_missing and keys is not None:
        files = check_missing_files(datalist, keys, root_dir, allow_missing_keys)
        if files:
            msg = f"some files of the datalist are missing: {files}"
            if raise_error:
                raise ValueError(msg)
            warnings.warn(msg)
    data = partition_dataset(data=datalist, num_partitions=nfolds, shuffle=shuffle, seed=seed)
    train_list = select_cross_validation_folds(partitions=data, folds=train_folds)
    val_list = select_cross_validation_folds(partitions=data, folds=val_folds)
    ret = {train_key: train_list, val_key: val_list}
    if isinstance(filename, (str, Path)):
        with open(filename, "w") as f:
            json.dump(ret, f, indent=4)
    return ret


class TciaDataset(Randomizable, CacheDataset):
    """The Cancer Imaging Archive (TCIA) collection dataset: download (env-gated,
    zero-egress here) or load a pre-staged local layout
    ``<root>/<collection>/<patient>/<series>/{image,<seg_type>}/*.dcm``
    and split into training/validation/test sections
    (reference: monai/apps/datasets.py:404)."""

    def __init__(self, root_dir: str, collection: str, section: str, transform=(),
                 download: bool = False, download_len: int = -1, seg_type: str = "SEG",
                 modality_tag: tuple = (0x0008, 0x0060),
                 ref_series_uid_tag: tuple = (0x0020, 0x000E),
                 ref_sop_uid_tag: tuple = (0x0008, 0x1155),
                 specific_tags: tuple = ((0x0008, 0x1115), (0x0008, 0x1140), (0x3006, 0x0010),
                                         (0x0020, 0x000D), (0x0010, 0x0010), (0x0010, 0x0020),
                                         (0x0020, 0x0011), (0x0020, 0x0012)),
                 fname_regex: str | None = None, seed: int = 0, val_frac: float = 0.2,
                 cache_num: int = sys.maxsize, cache_rate: float = 0.0, num_workers: int = 1,
                 progress: bool = True, copy_cache: bool = True, as_contiguous: bool = True,
                 runtime_cache: bool = False):
        from .tcia import DCM_FILENAME_REGEX, download_tcia_series_instance, get_tcia_metadata

        root = Path(root_dir)
        if not root.is_dir():
            raise ValueError("Root directory root_dir must be a directory.")
        self.section = section
        self.val_frac = val_frac
        self.seg_type = seg_type
        self.modality_tag = modality_tag
        self.ref_series_uid_tag = ref_series_uid_tag
        self.ref_sop_uid_tag = ref_sop_uid_tag
        self.set_random_state(seed=seed)
        download_dir = os.path.join(root, collection)
        self.load_tags = list(specific_tags) + [modality_tag]
        if download:
            seg_series_list = get_tcia_metadata(
                query=f"getSeries?Collection={collection}&Modality={seg_type}",
                attribute="SeriesInstanceUID")
            if download_len > 0:
                seg_series_list = seg_series_list[:download_len]
            if len(seg_series_list) == 0:
                raise ValueError(
                    f"Cannot find data with collection: {collection} seg_type: {seg_type}")
            for series_uid in seg_series_list:
                self._download_series_reference_data(series_uid, download_dir)
        if not os.path.exists(download_dir):
            raise RuntimeError(f"Cannot find dataset directory: {download_dir}.")
        self.fname_regex = DCM_FILENAME_REGEX if fname_regex is None else fname_regex
        self.indices: np.ndarray = np.array([])
        self.datalist = self._generate_data_list(download_dir)
        if transform == ():
            transform = LoadImaged(keys=["image"], reader="PydicomReader",
                                   fname_regex=self.fname_regex)
        CacheDataset.__init__(self, data=self.datalist, transform=transform,
                              cache_num=cache_num, cache_rate=cache_rate,
                              num_workers=num_workers, progress=progress,
                              copy_cache=copy_cache, as_contiguous=as_contiguous,
                              runtime_cache=runtime_cache)

    def get_indices(self) -> np.ndarray:
        return self.indices

    def randomize(self, data: np.ndarray) -> None:
        self.R.shuffle(data)

    def _download_series_reference_data(self, series_uid: str, download_dir: str) -> None:
        """Download one SEG series, then locate and download the referenced image
        series (reference: apps/datasets.py:587)."""
        import shutil
        import warnings

        from ..data.image_reader import PydicomReader
        from .tcia import (download_tcia_series_instance, get_tcia_ref_uid,
                           match_tcia_ref_uid_in_study)

        seg_first_dir = os.path.join(download_dir, "raw", series_uid)
        download_tcia_series_instance(series_uid=series_uid, download_dir=download_dir,
                                      output_dir=seg_first_dir, check_md5=False)
        dicom_files = [f for f in sorted(os.listdir(seg_first_dir)) if f.endswith(".dcm")]
        dcm_path = os.path.join(seg_first_dir, dicom_files[0])
        reader = PydicomReader(stop_before_pixels=True, specific_tags=self.load_tags)
        ds = reader.read(dcm_path)
        patient_id = getattr(ds, "PatientID", "") or getattr(ds, "PatientName", "")
        if not patient_id:
            warnings.warn(f"unable to find patient name of dicom file: {dcm_path}, "
                          "use 'patient' instead.")
            patient_id = "patient"
        series_num = getattr(ds, "SeriesNumber", "") or getattr(ds, "AcquisitionNumber", "")
        if not series_num:
            warnings.warn(f"unable to find series number of dicom file: {dcm_path}, "
                          "use '0' instead.")
            series_num = 0
        series_num = str(series_num)
        seg_dir = os.path.join(download_dir, str(patient_id), series_num, self.seg_type.lower())
        dcm_dir = os.path.join(download_dir, str(patient_id), series_num, "image")
        ref_uid_list = []
        for dcm_file in dicom_files:
            ds = reader.read(os.path.join(seg_first_dir, dcm_file))
            if ds[self.modality_tag].value == self.seg_type:
                ref_uid = get_tcia_ref_uid(ds, find_sop=False,
                                           ref_series_uid_tag=self.ref_series_uid_tag,
                                           ref_sop_uid_tag=self.ref_sop_uid_tag)
                if ref_uid == "":
                    ref_sop_uid = get_tcia_ref_uid(ds, find_sop=True,
                                                   ref_series_uid_tag=self.ref_series_uid_tag,
                                                   ref_sop_uid_tag=self.ref_sop_uid_tag)
                    ref_uid = match_tcia_ref_uid_in_study(ds.StudyInstanceUID, ref_sop_uid)
                if ref_uid != "":
                    ref_uid_list.append(ref_uid)
        if not ref_uid_list:
            warnings.warn(f"Cannot find the referenced Series Instance UID from series: "
                          f"{series_uid}.")
        else:
            download_tcia_series_instance(series_uid=ref_uid_list[0],
                                          download_dir=download_dir, output_dir=dcm_dir,
                                          check_md5=False)
        if not os.path.exists(seg_dir):
            shutil.copytree(seg_first_dir, seg_dir)

    def _generate_data_list(self, dataset_dir) -> list[dict]:
        dataset_dir = Path(dataset_dir)
        datalist = []
        patient_list = [f.name for f in os.scandir(dataset_dir) if f.is_dir() and f.name != "raw"]
        for patient_id in patient_list:
            series_list = [f.name for f in os.scandir(os.path.join(dataset_dir, patient_id))
                           if f.is_dir()]
            for series_num in series_list:
                seg_key = self.seg_type.lower()
                image_path = os.path.join(dataset_dir, patient_id, series_num, "image")
                mask_path = os.path.join(dataset_dir, patient_id, series_num, seg_key)
                if os.path.exists(image_path):
                    datalist.append({"image": image_path, seg_key: mask_path})
                else:
                    datalist.append({seg_key: mask_path})
        return self._split_datalist(datalist)

    def _split_datalist(self, datalist: list[dict]) -> list[dict]:
        if self.section == "test":
            return datalist
        length = len(datalist)
        indices = np.arange(length)
        self.randomize(indices)
        val_length = int(length * self.val_frac)
        if self.section == "training":
            self.indices = indices[val_length:]
        else:
            self.indices = indices[:val_length]
        return [datalist[i] for i in self.indices]
