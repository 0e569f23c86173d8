from .nnunetv2_runner import nnUNetV2Runner
from .nnunet_bundle import (
    ModelnnUNetWrapper,
    convert_monai_bundle_to_nnunet,
    convert_nnunet_to_monai_bundle,
    get_jax_network_from_nnunet_plans,
    get_network_from_nnunet_plans,
    get_nnunet_monai_predictor,
    get_nnunet_trainer,
)
from .utils import NNUNETMode, analyze_data, create_new_data_copy, create_new_dataset_json
