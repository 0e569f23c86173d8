"""DeepEdit click-simulation interaction loop (reference:
monai/apps/deepedit/interaction.py:26 Interaction).

The same engine-iteration wrapper as deepgrow's Interaction (the reference classes are
near-identical); re-exported here for API parity with the reference package layout.
"""
from ...apps.deepgrow.interaction import Interaction

__all__ = ["Interaction"]
