"""Offline training-data generation (the reference's dataset_process/).

Host-side numpy pipeline: SLAM-style sequences -> multi-view submap samples
-> FPS keypoints + SpinNet features -> PLY/HDF5 training datasets + splits.
"""

from . import datasets, geometry, io, preview, splits, submaps
from .extract_features import SampleProcessor, process_dataset_folder
from .process import SequenceProcessingConfig, process_sequence
