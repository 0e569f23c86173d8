"""Data-consistency cascade block of the variational network
(reference: monai/apps/reconstruction/networks/blocks/varnetblock.py)."""
from ..._networks_impl import _VarNetBlock as VarNetBlock

__all__ = ["VarNetBlock"]
