"""HTTP serving layer: aiohttp API + request micro-batching."""

from .batching import BatchingQueue
from .server import ApiServer

__all__ = ["ApiServer", "BatchingQueue"]
