from .functional import make_nnmf_op, unfold
from .layers import (
    AutoNNMFLayer,
    NNMFConv2d,
    NNMFEncoderDecoder,
    NNMFLinear,
    has_nnmf_weights,
    nnmf_after_care,
)
from .optimizer import scale_by_madam

__all__ = [
    "make_nnmf_op",
    "unfold",
    "NNMFConv2d",
    "AutoNNMFLayer",
    "NNMFEncoderDecoder",
    "NNMFLinear",
    "nnmf_after_care",
    "has_nnmf_weights",
    "scale_by_madam",
]
