"""Mesh construction and multi-chip collectives."""

from .collectives import sharded_brute_topk, sharded_int8_topk
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    corpus_sharding,
    make_mesh,
    pad_corpus,
    pad_rows,
    replicated,
    row_sharding,
    single_device_mesh,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "corpus_sharding",
    "make_mesh",
    "pad_corpus",
    "pad_rows",
    "replicated",
    "row_sharding",
    "sharded_brute_topk",
    "sharded_int8_topk",
    "single_device_mesh",
]
