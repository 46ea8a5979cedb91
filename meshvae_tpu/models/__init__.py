from .vae import MeshVAE
from .gcn import ChebGCN
from .operators import ModelOperators, build_operators

__all__ = ["MeshVAE", "ChebGCN", "ModelOperators", "build_operators"]
