"""Model zoo: MiniLM sentence encoder (flagship) + tokenizer + training."""

from .minilm import (
    MiniLMConfig,
    count_params,
    encode,
    forward,
    init_params,
    load_hf_checkpoint,
    param_partition_specs,
)
from .tokenizer import (
    WordPieceTokenizer,
    basic_tokenize,
    load_tokenizer,
    train_wordpiece_vocab,
)

__all__ = [
    "MiniLMConfig",
    "WordPieceTokenizer",
    "basic_tokenize",
    "count_params",
    "encode",
    "forward",
    "init_params",
    "load_hf_checkpoint",
    "load_tokenizer",
    "param_partition_specs",
    "train_wordpiece_vocab",
]
