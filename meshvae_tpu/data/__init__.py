from .dataset import MeshDataset, list_meshes, BatchIterator
from .synthetic import generate_synthetic_dataset

__all__ = ["MeshDataset", "list_meshes", "BatchIterator",
           "generate_synthetic_dataset"]
