from .adaptors import FunctionSignature, adaptor, apply_alias, to_kwargs
from .compose import Compose, OneOf, RandomOrder, SomeOf, execute_compose
from .grid_ops import GridPatch, GridSplit, RandGridPatch
from .utils_morphological_ops import dilate, erode
from .lazy_utils import DisplacementField
from .croppad_array import *  # noqa: F401,F403
from .dictionary import *  # noqa: F401,F403
from .intensity_array import *  # noqa: F401,F403
from .inverse import InvertibleTransform, TraceableTransform
from .inverse_batch_transform import BatchInverseTransform
from .meta_utility import FromMetaImaged, FromMetaTensord, ToMetaImaged, ToMetaTensord
from .io_array import LoadImage, SaveImage, WriteFileMapping
from .profiling_transforms import (
    Mark,
    Markd,
    RandMark,
    RandRangePop,
    RandRangePush,
    RangePop,
    RangePopd,
    RangePush,
    RangePushd,
)
from .lazy_executor import (
    ApplyPending,
    ApplyPendingd,
    apply_pending,
    apply_pending_transforms,
    apply_pending_transforms_in_order,
)
from .lazy_utils import (
    affine_from_pending,
    combine_transforms,
    is_compatible_apply_kwargs,
    kwargs_from_pending,
    pending_op,
    requires_interp,
    resample,
)
from .post_array import *  # noqa: F401,F403
from .regularization_array import CutMix, CutOut, Mixer, MixUp
from .signal_array import *  # noqa: F401,F403
from .smooth_field_array import (
    RandSmoothDeform,
    RandSmoothFieldAdjustContrast,
    RandSmoothFieldAdjustIntensity,
    SmoothField,
)
from .spatial_array import *  # noqa: F401,F403
from .traits import (
    InvertibleTrait,
    LazyTrait,
    MultiSampleTrait,
    RandomizableTrait,
    ThreadUnsafe,
)
from .transform import (
    LazyTransform,
    MapTransform,
    Randomizable,
    RandomizableTransform,
    Transform,
    apply_transform,
)
from .utility_array import *  # noqa: F401,F403
from .utils import (
    Fourier,
    check_non_lazy_pending_ops,
    compute_divisible_spatial_size,
    convert_pad_mode,
    correct_crop_centers,
    create_control_grid,
    create_grid,
    create_rotate,
    create_scale,
    create_shear,
    create_translate,
    distance_transform_edt,
    fill_holes,
    generate_label_classes_crop_centers,
    generate_pos_neg_label_crop_centers,
    generate_spatial_bounding_box,
    get_extreme_points,
    get_largest_connected_component_mask,
    is_positive,
    map_binary_to_indices,
    map_classes_to_indices,
    map_spatial_axes,
    remove_small_objects,
    weighted_patch_samples,
)

# reference-name capital-D / Dict aliases (reference: transforms/nvtx.py tail,
# meta_utility/dictionary.py, lazy/dictionary.py)
RangePushDict = RangePushD = RangePush
RandRangePushDict = RandRangePushD = RandRangePushd = RandRangePush
RangePopDict = RangePopD = RangePop
RandRangePopDict = RandRangePopD = RandRangePopd = RandRangePop
MarkDict = MarkD = Mark
RandMarkDict = RandMarkD = RandMarkd = RandMark
ApplyPendingDict = ApplyPendingD = ApplyPendingd
ToMetaTensorDict = ToMetaTensorD = ToMetaTensord
FromMetaTensorDict = FromMetaTensorD = FromMetaTensord
from .io_array import SUPPORTED_READERS
from .utility_array import ToJax as ToTensor
from .utils_backend_unification import (
    allclose,
    any_np_pt,
    argsort,
    argwhere,
    ascontiguousarray,
    clip,
    concatenate,
    cumsum,
    floor_divide,
    in1d,
    isfinite,
    isnan,
    linalg_inv,
    maximum,
    mode,
    moveaxis,
    nonzero,
    percentile,
    ravel,
    repeat,
    searchsorted,
    softplus,
    stack,
    unravel_index,
    unravel_indices,
    where,
)
from .utils import (
    attach_hook,
    convert_applied_interp_mode,
    copypaste_arrays,
    equalize_hist,
    get_number_image_type_conversions,
    get_transform_backends,
    in_bounds,
    map_and_generate_sampling_centers,
    print_transform_backends,
    rand_choice,
    rescale_array,
    rescale_array_int_max,
    rescale_instance_array,
    reset_ops_id,
    resize_center,
    resolves_modes,
    sync_meta_info,
    zero_margins,
    img_bounds,
    is_empty,
)
from .croppad_functional import crop_func, crop_or_pad_nd, pad_func, pad_nd
from .utils import (
    allow_missing_keys_mode,
    apply_affine_to_points,
    check_applied_operations,
    check_boundaries,
    convert_to_contiguous,
    get_unique_labels,
    has_status_keys,
    keep_components_with_positive_points,
    paste,
    paste_slices,
    soft_clip,
    squarepulse,
)
from .io_array import switch_endianness
from .croppad_array import replace_element
from .utils_morphological_ops import dilate_t, erode_t, get_morphological_filter_result_t
from .spatial_functional import (
    affine_func,
    convert_box_to_points,
    convert_points_to_box,
    flip,
    orientation,
    resize,
    rotate,
    rotate90,
    spatial_resample,
    zoom,
)
