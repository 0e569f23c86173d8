from .analyzer import DataAnalyzer
from .algo_gen import Algo, AlgoGen, BundleAlgo, SegAlgo
from .auto_runner import AutoRunner
from .ensemble_builder import AlgoEnsemble, AlgoEnsembleBestByFold, AlgoEnsembleBestN, EnsembleBuilder
