"""Variational network for accelerated MRI (reference:
monai/apps/reconstruction/networks/nets/varnet.py:25); implementation in
apps/reconstruction/networks.py (flat module shared by the nets re-exports)."""
from ..._networks_impl import VariationalNetworkModel

__all__ = ["VariationalNetworkModel"]
