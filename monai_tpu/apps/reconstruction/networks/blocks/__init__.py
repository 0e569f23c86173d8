from .varnetblock import VarNetBlock
