from .leaf_hash import leaf_hashes
from .tree_reduce import slice_root
