from .backend import (
    NdarrayOrJax,
    convert_to_dst_type as backend_convert_to_dst_type,
    is_jax,
    to_jax,
    to_numpy,
    xp,
)
from .enums import (
    AdversarialKeys,
    AlgoKeys,
    Average,
    BlendMode,
    BoxModeName,
    ChannelMatching,
    ColorOrder,
    CommonKeys,
    CompInitMode,
    DiceCEReduction,
    EngineStatsKeys,
    GanKeys,
    GridSampleMode,
    GridSamplePadMode,
    InterpolateMode,
    LazyAttr,
    LossReduction,
    Method,
    MetaKeys,
    MetricReduction,
    HoVerNetBranch,
    HoVerNetMode,
    JITMetadataKeys,
    NumpyPadMode,
    OrderingTransformations,
    OrderingType,
    PatchKeys,
    PostFix,
    PytorchPadMode,
    SkipMode,
    SpaceKeys,
    StrEnum,
    TraceKeys,
    TransformBackends,
    Weight,
    WSIPatchKeys,
)
from .misc import (
    ImageMetaKey,
    MONAIEnvVars,
    ConvertUnits,
    RestartGenerator,
    ensure_tuple,
    ensure_tuple_rep,
    ensure_tuple_size,
    fall_back_tuple,
    first,
    get_seed,
    is_scalar,
    is_scalar_tensor,
    issequenceiterable,
    pprint_edges,
    progress_bar,
    set_determinism,
    str2bool,
    str2list,
)
from .module import (
    IgniteInfo,
    InvalidPyTorchVersionError,
    OptionalImportError,
    damerau_levenshtein_distance,
    exact_version,
    get_full_type_name,
    get_package_version,
    instantiate,
    load_submodules,
    locate,
    look_up_option,
    min_version,
    optional_import,
    require_pkg,
    version_geq,
    version_leq,
)
from .type_conversion import (
    convert_data_type,
    convert_to_dst_type,
    convert_to_jax,
    convert_to_numpy,
    dtype_jax_to_numpy,
    dtype_numpy_to_jax,
    get_dtype,
    get_equivalent_dtype,
)
from .dist import (
    RankFilter,
    evenly_divisible_all_gather,
    get_rank,
    get_world_size,
    initialize_distributed,
    is_main_process,
    string_list_all_gather,
)
from .prng import MAX_SEED, derive_seed, fold_in_index, key_from_state, split_keys
from .ordering import Ordering

from .component_store import ComponentStore
from .state_cacher import StateCacher
from .profiling import PerfContext, ProfileHandler, Range, WorkflowProfiler
from .decorators import MethodReplacer
from .deprecate_utils import DeprecatedError, deprecated, deprecated_arg, deprecated_arg_default
from .enums import (
    AdversarialIterationEvents,
    BundleProperty,
    BundlePropertyConfig,
    DownsampleMode,
    FastMRIKeys,
    ForwardMode,
    GridPatchSort,
    NdimageMode,
    ProbMapKeys,
    SplineMode,
    StatusMembers,
)
from .jupyter_utils import ThreadContainer
from .misc import (
    check_kwargs_exist_in_class_init,
    check_parent_dir,
    copy_to_device,
    flatten_dict,
    has_option,
    is_immutable,
    is_module_ver_at_least,
    is_sqrt,
    list_to_dict,
    path_to_uri,
    run_cmd,
    sample_slices,
    save_obj,
    star_zip_with,
    to_tuple_of_dictionaries,
    unsqueeze_left,
    unsqueeze_right,
    zip_with,
)
from .type_conversion import convert_to_list

# familiarity alias for reference users: torch tensors -> jax arrays here
from .type_conversion import convert_to_jax as convert_to_tensor
