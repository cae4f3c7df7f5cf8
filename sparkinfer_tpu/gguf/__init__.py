from .constants import GGMLType, GGUFValueType, Keys, TokenType, tensor_nbytes
from .quants import dequantize, dequantize_tensor, quantize
from .reader import GGUFReader, TensorInfo
from .writer import GGUFWriter

__all__ = [
    "GGMLType",
    "GGUFValueType",
    "Keys",
    "TokenType",
    "GGUFReader",
    "GGUFWriter",
    "TensorInfo",
    "dequantize",
    "dequantize_tensor",
    "quantize",
    "tensor_nbytes",
]
