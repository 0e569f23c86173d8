"""nnU-Net <-> MONAI-bundle integration (reference: monai/apps/nnunet/nnunet_bundle.py).

The pieces that orchestrate files/checkpoints (``convert_nnunet_to_monai_bundle``,
``convert_monai_bundle_to_nnunet``) run with plain torch (available here). The
pieces that need the optional ``nnunetv2`` package (predictor construction,
plans-based network building, trainer setup) gate the import and raise a clear
error when it is absent — this environment cannot install it, so those paths are
exercised with mocks in tests (tests/test_nnunet_bundle.py).
"""
from __future__ import annotations

import os
import shutil
from pathlib import Path
from typing import Any, Optional, Union

import numpy as np

from ...data.meta_image import MetaImage
from ...utils.module import optional_import

__all__ = ["ModelnnUNetWrapper", "get_nnunet_monai_predictor",
           "convert_nnunet_to_monai_bundle", "convert_monai_bundle_to_nnunet",
           "get_network_from_nnunet_plans", "get_jax_network_from_nnunet_plans",
           "get_nnunet_trainer"]


def _require(module: str):
    mod, has = optional_import(module)
    if not has:
        raise ImportError(
            f"'{module}' is required for this nnU-Net integration path and is not "
            "installed in this environment.")
    return mod


def _load_json(path) -> dict:
    import json

    with open(path) as f:
        return json.load(f)


class ModelnnUNetWrapper:
    """Wrap an ``nnUNetPredictor`` as a MONAI-style network callable for bundle
    inference (reference: nnunet_bundle.py:142).

    Loads dataset.json / plans.json / nnunet_checkpoint.pth from the parent of
    ``model_folder``, restores the trainer's network architecture through
    nnunetv2's plans machinery, and exposes ``__call__(MetaImage) -> MetaImage``
    running the predictor on the array with spacing pulled from the metadata.
    """

    def __init__(self, predictor: object, model_folder: Union[str, Path],
                 model_name: str = "model.pt"):
        self.predictor = predictor
        model_training_output_dir = model_folder
        torch = _require("torch")
        nnunetv2 = _require("nnunetv2")
        from nnunetv2.utilities.find_class_by_name import recursive_find_python_class
        from nnunetv2.utilities.label_handling.label_handling import (
            determine_num_input_channels,
        )
        from nnunetv2.utilities.plans_handling.plans_handler import PlansManager

        parent = Path(model_training_output_dir).parent
        dataset_json = _load_json(parent / "dataset.json")
        plans = _load_json(parent / "plans.json")
        plans_manager = PlansManager(plans)

        parameters = []
        checkpoint = torch.load(parent / "nnunet_checkpoint.pth", map_location="cpu")
        trainer_name = checkpoint["trainer_name"]
        configuration_name = checkpoint["init_args"]["configuration"]
        inference_allowed_mirroring_axes = checkpoint.get("inference_allowed_mirroring_axes")
        model_file = Path(model_training_output_dir) / model_name
        if model_file.is_file():
            monai_checkpoint = torch.load(model_file, map_location="cpu")
            parameters.append(monai_checkpoint.get("network_weights", monai_checkpoint))

        configuration_manager = plans_manager.get_configuration(configuration_name)
        num_input_channels = determine_num_input_channels(plans_manager,
                                                          configuration_manager, dataset_json)
        trainer_class = recursive_find_python_class(
            os.path.join(nnunetv2.__path__[0], "training", "nnUNetTrainer"),
            trainer_name, "nnunetv2.training.nnUNetTrainer")
        if trainer_class is None:
            raise RuntimeError(
                f"Unable to locate trainer class {trainer_name} in "
                "nnunetv2.training.nnUNetTrainer.")
        network = trainer_class.build_network_architecture(
            configuration_manager.network_arch_class_name,
            configuration_manager.network_arch_init_kwargs,
            configuration_manager.network_arch_init_kwargs_req_import,
            num_input_channels,
            plans_manager.get_label_manager(dataset_json).num_segmentation_heads,
            enable_deep_supervision=False)

        predictor.plans_manager = plans_manager
        predictor.configuration_manager = configuration_manager
        predictor.list_of_parameters = parameters
        predictor.network = network
        predictor.dataset_json = dataset_json
        predictor.trainer_name = trainer_name
        predictor.allowed_mirroring_axes = inference_allowed_mirroring_axes
        predictor.label_manager = plans_manager.get_label_manager(dataset_json)
        self.network_weights = predictor.network

    @staticmethod
    def spacing_from_meta(meta: dict) -> list[float]:
        """Spacing extraction used by forward (reference: nnunet_bundle.py:257)."""
        if "pixdim" in meta:
            pixdim = np.asarray(meta["pixdim"])
            pixdim = pixdim[0] if pixdim.ndim > 1 else pixdim
            return [float(v) for v in pixdim[1:4]]
        if "affine" in meta:
            affine = np.asarray(meta["affine"])
            return [abs(float(affine[i][i])) for i in range(3)]
        return [1.0, 1.0, 1.0]

    def __call__(self, x: MetaImage):
        if not isinstance(x, MetaImage):
            raise TypeError("Input must be a MetaImage (MetaTensor).")
        properties = {"spacing": self.spacing_from_meta(dict(x.meta))}
        image = np.asarray(x.data)[0, :]
        prediction_output = self.predictor.predict_from_list_of_npy_arrays(
            image, None, properties, truncated_ofname=None, save_probabilities=False,
            num_processes=2, num_processes_segmentation_export=2)
        out = np.concatenate([o[None, None] for o in prediction_output], axis=0)
        return x.new_like(out)

    forward = __call__


def get_nnunet_monai_predictor(model_folder: Union[str, Path],
                               model_name: str = "model.pt") -> ModelnnUNetWrapper:
    """Build an ``nnUNetPredictor``-backed wrapper for bundle inference
    (reference: nnunet_bundle.py:293)."""
    _require("nnunetv2")
    from nnunetv2.inference.predict_from_raw_data import nnUNetPredictor

    predictor = nnUNetPredictor(tile_step_size=0.5, use_gaussian=True, use_mirroring=False,
                                device=None, verbose=False, verbose_preprocessing=False,
                                allow_tqdm=True)
    return ModelnnUNetWrapper(predictor, model_folder, model_name)


def convert_nnunet_to_monai_bundle(nnunet_config: dict, bundle_root_folder: str,
                                   fold: int = 0) -> None:
    """Repackage trained nnU-Net checkpoints into MONAI-bundle layout
    (reference: nnunet_bundle.py:347)."""
    torch = _require("torch")
    nnunet_trainer = nnunet_config.get("nnunet_trainer", "nnUNetTrainer")
    nnunet_plans = nnunet_config.get("nnunet_plans", "nnUNetPlans")
    nnunet_configuration = nnunet_config.get("nnunet_configuration", "3d_fullres")
    dataset_name = nnunet_config["dataset_name_or_id"]
    if str(dataset_name).isdigit():
        from nnunetv2.utilities.dataset_name_id_conversion import (
            maybe_convert_to_dataset_name,
        )

        dataset_name = maybe_convert_to_dataset_name(int(dataset_name))
    nnunet_model_folder = Path(os.environ["nnUNet_results"]).joinpath(
        dataset_name, f"{nnunet_trainer}__{nnunet_plans}__{nnunet_configuration}")

    final = torch.load(nnunet_model_folder / f"fold_{fold}" / "checkpoint_final.pth",
                       map_location="cpu", weights_only=False)
    best = torch.load(nnunet_model_folder / f"fold_{fold}" / "checkpoint_best.pth",
                      map_location="cpu", weights_only=False)

    models_dir = Path(bundle_root_folder) / "models"
    (models_dir / f"fold_{fold}").mkdir(parents=True, exist_ok=True)
    torch.save({"inference_allowed_mirroring_axes": final["inference_allowed_mirroring_axes"],
                "init_args": final["init_args"],
                "trainer_name": final["trainer_name"]},
               models_dir / "nnunet_checkpoint.pth")
    torch.save({"network_weights": final["network_weights"]},
               models_dir / f"fold_{fold}" / "model.pt")
    torch.save({"network_weights": best["network_weights"]},
               models_dir / f"fold_{fold}" / "best_model.pt")
    for fname in ("plans.json", "dataset.json"):
        if not (models_dir / fname).exists():
            shutil.copy(nnunet_model_folder / fname, models_dir / fname)


def convert_monai_bundle_to_nnunet(nnunet_config: dict, bundle_root_folder: str,
                                   fold: int = 0) -> None:
    """Export MONAI-bundle training checkpoints back into nnU-Net result layout
    (reference: nnunet_bundle.py:478)."""
    torch = _require("torch")
    nnunet_trainer = nnunet_config.get("nnunet_trainer", "nnUNetTrainer")
    nnunet_plans = nnunet_config.get("nnunet_plans", "nnUNetPlans")
    dataset_name = nnunet_config["dataset_name_or_id"]
    if str(dataset_name).isdigit():
        from nnunetv2.utilities.dataset_name_id_conversion import (
            maybe_convert_to_dataset_name,
        )

        dataset_name = maybe_convert_to_dataset_name(int(dataset_name))

    def subfiles(folder, prefix=None, suffix=None, sort=True):
        res = [i.name for i in Path(folder).iterdir() if i.is_file()
               and (prefix is None or i.name.startswith(prefix))
               and (suffix is None or i.name.endswith(suffix))]
        return sorted(res) if sort else res

    nnunet_model_folder = Path(os.environ["nnUNet_results"]).joinpath(
        dataset_name, f"{nnunet_trainer}__{nnunet_plans}__3d_fullres")
    (nnunet_model_folder / f"fold_{fold}").mkdir(parents=True, exist_ok=True)

    bundle_fold = Path(bundle_root_folder) / "models" / f"fold_{fold}"
    nnunet_checkpoint = torch.load(Path(bundle_root_folder) / "models" / "nnunet_checkpoint.pth",
                                   map_location="cpu", weights_only=False)
    epochs = sorted(int(f[len("checkpoint_epoch="):-len(".pt")])
                    for f in subfiles(bundle_fold, prefix="checkpoint_epoch"))
    monai_last = torch.load(bundle_fold / f"checkpoint_epoch={epochs[-1]}.pt",
                            map_location="cpu", weights_only=False)
    key_metrics = sorted(f[len("checkpoint_key_metric="):-len(".pt")]
                         for f in subfiles(bundle_fold, prefix="checkpoint_key_metric"))
    monai_best = torch.load(bundle_fold / f"checkpoint_key_metric={key_metrics[-1]}.pt",
                            map_location="cpu", weights_only=False)

    nnunet_checkpoint["optimizer_state"] = monai_last.get("optimizer_state")
    nnunet_checkpoint["network_weights"] = {}
    odict_like = nnunet_checkpoint["network_weights"]
    for key in monai_last["network_weights"]:
        odict_like[key] = monai_last["network_weights"][key]
    nnunet_checkpoint["current_epoch"] = epochs[-1]
    torch.save(nnunet_checkpoint, nnunet_model_folder / f"fold_{fold}" / "checkpoint_final.pth")

    best_ckpt = dict(nnunet_checkpoint)
    best_ckpt["network_weights"] = dict(monai_best["network_weights"])
    torch.save(best_ckpt, nnunet_model_folder / f"fold_{fold}" / "checkpoint_best.pth")


def get_network_from_nnunet_plans(plans_file: str, dataset_file: str, configuration: str,
                                  model_ckpt: Optional[str] = None,
                                  model_key_in_ckpt: str = "model") -> Any:
    """Build the nnU-Net architecture described by a plans/dataset pair
    (reference: nnunet_bundle.py:417)."""
    _require("nnunetv2")
    torch = _require("torch")
    from nnunetv2.utilities.get_network_from_plans import get_network_from_plans
    from nnunetv2.utilities.label_handling.label_handling import (
        determine_num_input_channels,
    )
    from nnunetv2.utilities.plans_handling.plans_handler import PlansManager

    plans = _load_json(plans_file)
    dataset_json = _load_json(dataset_file)
    plans_manager = PlansManager(plans)
    configuration_manager = plans_manager.get_configuration(configuration)
    num_input_channels = determine_num_input_channels(plans_manager, configuration_manager,
                                                      dataset_json)
    label_manager = plans_manager.get_label_manager(dataset_json)
    network = get_network_from_plans(
        configuration_manager.network_arch_class_name,
        configuration_manager.network_arch_init_kwargs,
        configuration_manager.network_arch_init_kwargs_req_import,
        num_input_channels, label_manager.num_segmentation_heads,
        allow_init=True, deep_supervision=True)
    if model_ckpt is None:
        return network
    state_dict = torch.load(model_ckpt, map_location="cpu")
    network.load_state_dict(state_dict[model_key_in_ckpt])
    return network


def get_jax_network_from_nnunet_plans(plans_file: Union[str, Path, dict],
                                      dataset_file: Union[str, Path, dict],
                                      configuration: str = "3d_fullres",
                                      deep_supervision: bool = False,
                                      *, rngs=None):
    """TPU-native counterpart of :func:`get_network_from_nnunet_plans`: build a
    ``monai_tpu`` :class:`DynUNet` from an nnU-Net v2 plans/dataset pair, without
    needing the ``nnunetv2``/torch packages.

    Parses the modern plans schema (``configurations.<name>.architecture`` with
    ``network_class_name`` + ``arch_kwargs`` — the format nnUNetPlans.json files
    carry since nnunetv2 2.2). ``PlainConvUNet`` maps onto ``DynUNet`` with basic
    blocks, ``ResidualEncoderUNet`` onto res blocks; both use 2 convs per stage,
    which is what every shipped nnU-Net plan uses — anything else raises rather
    than silently building a different network.

    Reference behavior target: monai/apps/nnunet/nnunet_bundle.py:417
    (get_network_from_nnunet_plans) + dynamic_network_architectures PlainConvUNet.
    """
    from flax import nnx

    from ...networks.nets.dynunet import DynUNet

    plans = plans_file if isinstance(plans_file, dict) else _load_json(plans_file)
    dataset_json = dataset_file if isinstance(dataset_file, dict) else _load_json(dataset_file)
    try:
        cfg = plans["configurations"][configuration]
    except KeyError as e:
        raise KeyError(f"configuration {configuration!r} not in plans "
                       f"(has {sorted(plans.get('configurations', {}))})") from e
    arch = cfg["architecture"]
    class_name = arch["network_class_name"].rsplit(".", 1)[-1]
    if class_name not in ("PlainConvUNet", "ResidualEncoderUNet"):
        raise NotImplementedError(
            f"nnU-Net architecture {arch['network_class_name']!r} has no JAX mapping; "
            "supported: PlainConvUNet, ResidualEncoderUNet.")
    kw = arch["arch_kwargs"]
    conv_op = str(kw.get("conv_op", "Conv3d"))
    spatial_dims = 3 if conv_op.endswith("3d") else 2
    n_stages = int(kw["n_stages"])
    per_stage = list(kw["n_conv_per_stage"]) if isinstance(kw.get("n_conv_per_stage"), (list, tuple)) \
        else [kw.get("n_conv_per_stage", 2)] * n_stages
    if any(int(c) != 2 for c in per_stage):
        raise NotImplementedError(
            f"n_conv_per_stage={per_stage}: DynUNet stages are 2-conv blocks; refusing "
            "to build a structurally different network.")
    kernel_sizes = [list(k) if isinstance(k, (list, tuple)) else [k] * spatial_dims
                    for k in kw["kernel_sizes"]]
    strides = [list(s) if isinstance(s, (list, tuple)) else [s] * spatial_dims
               for s in kw["strides"]]
    filters = list(kw["features_per_stage"])
    norm_kwargs = kw.get("norm_op_kwargs") or {}
    norm_name = ("instance", {"affine": bool(norm_kwargs.get("affine", True))})
    nonlin = str(kw.get("nonlin", "LeakyReLU")).rsplit(".", 1)[-1].lower()
    nonlin_kwargs = kw.get("nonlin_kwargs") or {}
    if nonlin == "leakyrelu":
        act_name = ("leakyrelu", {"negative_slope": float(nonlin_kwargs.get("negative_slope", 0.01))})
    else:
        act_name = (nonlin, {})
    in_channels = len(dataset_json.get("channel_names")
                      or dataset_json.get("modality") or {"0": "x"})
    labels = dataset_json.get("labels", {})
    # v2 dataset.json maps name -> index (a region entry maps to a list of indices)
    n_fg = len({int(i) for v in labels.values()
                for i in (v if isinstance(v, (list, tuple)) else [v])} - {0}) if labels else 1
    out_channels = n_fg + 1
    return DynUNet(
        spatial_dims=spatial_dims, in_channels=in_channels, out_channels=out_channels,
        kernel_size=kernel_sizes, strides=strides, upsample_kernel_size=strides[1:],
        filters=filters, norm_name=norm_name, act_name=act_name,
        deep_supervision=deep_supervision,
        deep_supr_num=max(1, min(n_stages - 2, 3)) if deep_supervision else 1,
        res_block=(class_name == "ResidualEncoderUNet"),
        rngs=rngs if rngs is not None else nnx.Rngs(0))


def get_nnunet_trainer(dataset_name_or_id, configuration, fold, trainer_class_name="nnUNetTrainer",
                       plans_identifier="nnUNetPlans", use_compressed_data=False,
                       continue_training=False, only_run_validation=False,
                       disable_checkpointing=False, device="cpu",
                       pretrained_model=None) -> Any:
    """Construct and initialize an nnUNetTrainer (reference: nnunet_bundle.py:38)."""
    _require("nnunetv2")
    torch = _require("torch")
    from nnunetv2.run.run_training import get_trainer_from_args, maybe_load_checkpoint

    nnunet_trainer = get_trainer_from_args(str(dataset_name_or_id), configuration, fold,
                                           trainer_class_name, plans_identifier,
                                           device=torch.device(device))
    if disable_checkpointing:
        nnunet_trainer.disable_checkpointing = disable_checkpointing
    maybe_load_checkpoint(nnunet_trainer, continue_training, only_run_validation)
    nnunet_trainer.on_train_start()
    if pretrained_model is not None:
        state_dict = torch.load(pretrained_model)
        if "network_weights" in state_dict:
            nnunet_trainer.network._orig_mod.load_state_dict(state_dict["network_weights"])
    return nnunet_trainer
