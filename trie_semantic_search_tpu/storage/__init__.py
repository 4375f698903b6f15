"""Storage layer: sqlite doc store + device metadata columns."""

from .columns import MetadataColumns, date_to_int, int_to_date
from .store import StorageManager, StorageStats

__all__ = [
    "MetadataColumns",
    "StorageManager",
    "StorageStats",
    "date_to_int",
    "int_to_date",
]
