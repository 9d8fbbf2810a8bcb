from .batch import PartBatch
from . import flow, procrustes, sampler, segments
