"""Pathology transforms, laid out to mirror the reference package structure
(reference: monai/apps/pathology/transforms/{post,stain}); implementations live in
the sibling flat modules."""
from .post import *  # noqa: F401,F403
from .stain import *  # noqa: F401,F403
