from .transforms import (
    AddClickSignalsd,
    AddLabelAsGuidanced,
    AddPointGuidanceSignald,
    ExtractPatchd,
    FilterImaged,
    FlattenLabeld,
    NuclickKeys,
    PostFilterLabeld,
    SetLabelClassd,
    SplitLabeld,
)
