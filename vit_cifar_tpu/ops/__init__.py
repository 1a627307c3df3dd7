from .attention import MultiHeadSelfAttention
from .common import EncoderBlock, EncoderMLP
from .init import TorchLinear
from .patchify import to_words, from_words

__all__ = [
    "MultiHeadSelfAttention",
    "EncoderBlock",
    "EncoderMLP",
    "TorchLinear",
    "to_words",
    "from_words",
]
