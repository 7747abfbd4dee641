from .io import IO, read_pcd, write_pcd
from .loaders import DataLoader, data_init, DATASET_LOADER_MAPPING
from .datasets import TRAIN, TEST, VAL
from . import transforms

__all__ = [
    "IO", "read_pcd", "write_pcd", "DataLoader", "data_init",
    "DATASET_LOADER_MAPPING", "TRAIN", "TEST", "VAL", "transforms",
]
