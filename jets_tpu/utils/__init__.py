from . import tree
from .checkpoint import load_checkpoint, save_checkpoint
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
    "checked",
    "assert_finite",
    "crc32c",
    "tree_hash",
    "instrument",
    "op_cost",
    "trace",
]
