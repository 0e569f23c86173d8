from .array import *  # noqa: F401,F403
from .dictionary import *  # noqa: F401,F403
