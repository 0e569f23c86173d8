from .deviceconfig import (
    IgniteInfo,
    get_config_values,
    get_optional_config_values,
    get_system_info,
    print_config,
    print_debug_info,
    print_system_info,
    USE_COMPILED,
)
from .type_definitions import (
    DtypeLike,
    IndexSelection,
    KeysCollection,
    NdarrayOrTensor,
    PathLike,
    SequenceStr,
)
