from .nnunetv2_runner import nnUNetV2Runner
