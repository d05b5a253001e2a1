from . import tree
from .checkpoint import load_checkpoint, save_checkpoint
from .compression import (
    SnapshotStore,
    compress_array,
    compression_ratio,
    decompress_array,
)
from .dataloader import ShotGatherLoader, ShotGatherStore
from .guards import assert_finite, checked
from .hashing import crc32c, tree_hash
from .profiling import instrument, op_cost, trace

__all__ = [
    "tree",
    "save_checkpoint",
    "load_checkpoint",
    "ShotGatherStore",
    "ShotGatherLoader",
    "SnapshotStore",
    "compress_array",
    "decompress_array",
    "compression_ratio",
    "checked",
    "assert_finite",
    "crc32c",
    "tree_hash",
    "instrument",
    "op_cost",
    "trace",
]
