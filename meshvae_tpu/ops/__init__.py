from .graph import GraphOperator, PoolOperator, cheb_operator, pool_operator, embed_operator
from .cheb import cheb_conv
from .pool import pool_apply

__all__ = [
    "GraphOperator", "PoolOperator", "cheb_operator", "pool_operator",
    "embed_operator", "cheb_conv", "pool_apply",
]
