"""Reconstruction networks, laid out to mirror the reference package
(reference: monai/apps/reconstruction/networks/); implementations in the sibling
flat module apps/reconstruction/networks.py is re-exported via nets/."""
from .nets import CoilSensitivityModel, ComplexUnet, VariationalNetworkModel
