"""Data layer public API.

Lazily resolved (PEP 562) so that low-level modules (``meta_image``, ``affine_utils``)
can be imported by the transforms package without pulling in dataset/dataloader modules
that themselves depend on transforms — breaking the data<->transforms import cycle.
"""
from __future__ import annotations

import importlib

# always-safe low-level exports (no transforms dependency)
from .affine_utils import (
    affine_to_spacing,
    axcodes2ornt,
    compute_shape_offset,
    inv_ornt_aff,
    io_orientation,
    is_diagonal,
    orientation_ras_lps,
    ornt2axcodes,
    ornt_transform,
    reorient_spatial_axes,
    scale_affine,
    to_affine_nd,
    zoom_affine,
)
from .meta_image import MetaImage, get_track_meta, set_track_meta
from .nifti import NiftiHeader, read_nifti, write_nifti
from .synthetic import create_test_image_2d, create_test_image_3d

MetaTensor = MetaImage  # familiarity alias for reference users

# re-exported for parity with the reference's `monai.data` surface (used there for
# DataLoader worker pickling); arrays here are numpy/jax so the stdlib pickler suffices
from multiprocessing.reduction import ForkingPickler

_LAZY_ATTRS = {
    # dataloader
    "DataLoader": ".dataloader", "ThreadBuffer": ".dataloader", "ThreadDataLoader": ".dataloader",
    # dataset
    "ArrayDataset": ".dataset", "CacheDataset": ".dataset", "CacheNTransDataset": ".dataset",
    "CSVDataset": ".dataset", "Dataset": ".dataset", "DatasetFunc": ".dataset",
    "NPZDictItemDataset": ".dataset", "PersistentDataset": ".dataset",
    "SmartCacheDataset": ".dataset", "Subset": ".dataset", "ZipDataset": ".dataset",
    "LMDBDataset": ".dataset", "GDSDataset": ".dataset",
    # csv saver
    "CSVSaver": ".csv_saver",
    # WSI
    "BaseWSIReader": ".wsi_reader", "WSIReader": ".wsi_reader",
    "CuCIMWSIReader": ".wsi_reader", "OpenSlideWSIReader": ".wsi_reader",
    "TiffFileWSIReader": ".wsi_reader", "PILWSIReader": ".wsi_reader",
    "PatchWSIDataset": ".wsi_datasets", "SlidingPatchWSIDataset": ".wsi_datasets",
    "MaskedPatchWSIDataset": ".wsi_datasets",
    # video
    "VideoDataset": ".video_dataset", "VideoFileDataset": ".video_dataset",
    "CameraDataset": ".video_dataset",
    "ImageDataset": ".image_dataset",
    "MetaObj": ".meta_image", "FolderLayoutBase": ".folder_layout",
    "UltrasoundConfidenceMap": ".ultrasound_confidence_map",
    "NrrdImage": ".nrrd_io",
    # folder layout
    "FolderLayout": ".folder_layout", "default_name_formatter": ".folder_layout",
    # grid dataset
    "GridPatchDataset": ".grid_dataset", "PatchDataset": ".grid_dataset",
    "PatchIter": ".grid_dataset", "PatchIterd": ".grid_dataset",
    # readers / writers
    "ImageReader": ".image_reader", "ITKReader": ".image_reader", "NibabelReader": ".image_reader",
    "NiftiReader": ".image_reader", "NrrdReader": ".image_reader", "PydicomReader": ".image_reader", "NumpyReader": ".image_reader", "PILReader": ".image_reader",
    "ImageWriter": ".image_writer", "NibabelWriter": ".image_writer", "NiftiWriter": ".image_writer",
    "PILWriter": ".image_writer", "ITKWriter": ".image_writer", "register_writer": ".image_writer", "resolve_writer": ".image_writer",
    "SUPPORTED_WRITERS": ".image_writer",
    # iterable
    "CSVIterableDataset": ".iterable_dataset", "IterableDataset": ".iterable_dataset",
    "ShuffleBuffer": ".iterable_dataset",
    # samplers
    "DistributedSampler": ".samplers", "DistributedWeightedRandomSampler": ".samplers",
    # utils
    "collate_meta_tensor": ".utils", "compute_importance_map": ".utils", "decollate_batch": ".utils",
    "dense_patch_slices": ".utils", "get_random_patch": ".utils", "get_valid_patch_size": ".utils",
    "iter_patch": ".utils", "iter_patch_position": ".utils", "iter_patch_slices": ".utils",
    "json_hashing": ".utils", "list_data_collate": ".utils", "no_collation": ".utils",
    "pad_list_data_collate": ".utils", "partition_dataset": ".utils",
    "partition_dataset_classes": ".utils", "pickle_hashing": ".utils",
    "select_cross_validation_folds": ".utils", "set_rnd": ".utils", "worker_init_fn": ".utils",
    "pickle_operations": ".utils", "PICKLE_KEY_SUFFIX": ".utils",
    "sorted_dict": ".utils", "is_supported_format": ".utils",
    "create_file_basename": ".utils", "resample_datalist": ".utils",
    "convert_tables_to_dicts": ".utils",
    "boxes_center_distance": ".box_utils", "centers_in_boxes": ".box_utils",
    "correct_nifti_header_if_necessary": ".nifti", "rectify_header_sform_qform": ".nifti",
    "remove_keys": ".utils", "remove_extra_metadata": ".utils",
    "get_extra_metadata_keys": ".utils",
    "save_net_with_metadata": ".export_utils", "load_net_with_metadata": ".export_utils",
    "load_decathlon_datalist": "..apps.datasets", "load_decathlon_properties": "..apps.datasets",
    "check_missing_files": "..apps.datasets",
    "create_cross_validation_datalist": "..apps.datasets",
    # datasets with downloads
    "DatasetSummary": ".dataset_summary",
    "TestTimeAugmentation": ".test_time_augmentation",
    # boxes
    "BoxMode": ".box_utils", "CornerCornerModeTypeA": ".box_utils",
    "CornerCornerModeTypeB": ".box_utils", "CornerCornerModeTypeC": ".box_utils",
    "CornerSizeMode": ".box_utils", "CenterSizeMode": ".box_utils",
    "StandardMode": ".box_utils",
    "box_area": ".box_utils", "box_centers": ".box_utils", "box_giou": ".box_utils",
    "box_iou": ".box_utils", "box_pair_giou": ".box_utils", "centers_in_boxes": ".box_utils",
    "clip_boxes_to_image": ".box_utils", "convert_box_mode": ".box_utils",
    "convert_box_to_standard_mode": ".box_utils", "non_max_suppression": ".box_utils",
    "spatial_crop_boxes": ".box_utils", "standardize_empty_box": ".box_utils",
    "get_boxmode": ".box_utils", "batched_nms": ".box_utils",
    # round-4 function-surface additions
    "collate_meta_tensor_fn": ".utils", "dev_collate": ".utils", "is_no_channel": ".utils",
    "buffer_iterator": ".dataloader",
    "import_cv": ".video_dataset",
    "itk_image_to_metatensor": ".itk_torch_bridge", "metatensor_to_itk_image": ".itk_torch_bridge",
    "itk_to_monai_affine": ".itk_torch_bridge", "monai_to_itk_affine": ".itk_torch_bridge",
    "get_itk_image_center": ".itk_torch_bridge", "monai_to_itk_ddf": ".itk_torch_bridge",
}


def __getattr__(name: str):
    target = _LAZY_ATTRS.get(name)
    if target is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    mod = importlib.import_module(target, __name__)
    val = getattr(mod, name)
    globals()[name] = val
    return val


def __dir__():
    return sorted(set(globals()) | set(_LAZY_ATTRS))
