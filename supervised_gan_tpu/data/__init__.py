from .loader import CreateDataLoader
from .datasets import CreateDataset

__all__ = ["CreateDataLoader", "CreateDataset"]
