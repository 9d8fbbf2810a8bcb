from . import metrics
from .evaluator import Evaluator, EvalConfig
from .meter import MetricsMeter
