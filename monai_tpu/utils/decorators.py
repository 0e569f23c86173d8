"""Method-replacement decorators (reference: monai/utils/decorators.py)."""
from __future__ import annotations

from collections.abc import Callable

__all__ = ["RestartGenerator", "MethodReplacer"]

from .misc import RestartGenerator  # re-export, reference keeps it here


class MethodReplacer:
    """Base class for decorators that replace methods of a class with wrapped
    versions when the class is constructed (reference: decorators.py:35)."""

    replace_list_name = "__replacemethods__"

    def __init__(self, meth: Callable) -> None:
        self.meth = meth

    def replace_method(self, meth):
        return meth

    def __set_name__(self, owner, name):
        entry = (name, owner, self.replace_method)
        if not hasattr(owner, self.replace_list_name):
            oldinit = owner.__init__

            def newinit(_self, *args, **kwargs):
                for m, cls, replacer in getattr(_self, self.replace_list_name):
                    meth = getattr(_self, m)
                    if not isinstance(_self, cls):
                        continue
                    setattr(_self, m, replacer(meth))
                oldinit(_self, *args, **kwargs)

            owner.__init__ = newinit
            setattr(owner, self.replace_list_name, [entry])
        else:
            getattr(owner, self.replace_list_name).append(entry)
        setattr(owner, name, self.meth)
