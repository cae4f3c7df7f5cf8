from .config import SparseConfig
from .predictor import predict_activations
from .ffn import make_sparse_ffn, prepare_sparse_params, select_groups, sparse_layout

__all__ = [
    "SparseConfig",
    "predict_activations",
    "make_sparse_ffn",
    "prepare_sparse_params",
    "select_groups",
    "sparse_layout",
]
