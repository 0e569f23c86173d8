from .client import BaseClient, ClientAlgo, ClientAlgoStats, MonaiAlgo, MonaiAlgoStats
from .utils.exchange_object import ExchangeObject
from .utils.filters import Filter, SummaryFilter
from .utils.constants import ExtraItems, FlPhase, FlStatistics, ModelType, WeightType
