"""UNet over complex-as-channels data (reference:
monai/apps/reconstruction/networks/nets/complex_unet.py)."""
from ..._networks_impl import ComplexUnet

__all__ = ["ComplexUnet"]
