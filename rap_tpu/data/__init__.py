from .dataset import PointCloudDataset, Sample, DatasetConfig
from .packer import pack_samples, collate_to_part_batch, BatchPlan
from .loader import BatchLoader, LoaderConfig
