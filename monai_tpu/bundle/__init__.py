from .config_item import (
    ComponentLocator,
    ConfigComponent,
    ConfigExpression,
    ConfigItem,
    Instantiable,
)
from .config_parser import ConfigParser
from .properties import InferProperties, MetaProperties, TrainProperties
from .reference_resolver import ReferenceResolver
from .scripts import (
    ckpt_export,
    download,
    init_bundle,
    load,
    run,
    run_workflow,
    update_kwargs,
    verify_metadata,
    verify_net_in_out,
)
from .workflows import BundleWorkflow, ConfigWorkflow, PythonicWorkflow
from .utils import (
    DEFAULT_EXP_MGMT_SETTINGS,
    DEFAULT_HANDLERS_ID,
    DEFAULT_INFERENCE,
    DEFAULT_METADATA,
    DEFAULT_MLFLOW_SETTINGS,
    EXPR_KEY,
    ID_REF_KEY,
    ID_SEP_KEY,
    MACRO_KEY,
    MERGE_KEY,
)
