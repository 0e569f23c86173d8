from .algo_gen import Algo, AlgoGen
from .analyzer import (
    Analyzer,
    FgImageStats,
    FgImageStatsSumm,
    FilenameStats,
    ImageHistogram,
    ImageHistogramSumm,
    ImageStats,
    ImageStatsSumm,
    LabelStats,
    LabelStatsSumm,
)
from .operations import Operations, SampleOperations, SummaryOperations
from .seg_summarizer import SegSummarizer
