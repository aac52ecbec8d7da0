"""One-off real-TPU differential check of the fused-tail hot path."""
import numpy as np

from vk_merkle_roots_tpu import oracle
from vk_merkle_roots_tpu.ops.tree_reduce import reduce_perfect_block, slice_root
from vk_merkle_roots_tpu.utils.hexutil import words_to_digest

rng = np.random.default_rng(7)
for log2n in (10, 11, 13):
    n = 1 << log2n
    digs = rng.integers(0, 1 << 32, size=(n, 8), dtype=np.uint32)
    want = oracle.merkle_root_of_digests([words_to_digest(digs[i]) for i in range(n)])
    got = words_to_digest(np.asarray(reduce_perfect_block(digs, log2n)))
    assert got == want, f"perfect block log2n={log2n} MISMATCH"
    print(f"perfect 2^{log2n}: ok", flush=True)

# Ragged: count spanning a 1024-block (fused) + smaller blocks (XLA folds).
count, height = 1024 + 300, 11
digs = rng.integers(0, 1 << 32, size=(count, 8), dtype=np.uint32)
want = oracle.reduce_slice([words_to_digest(digs[i]) for i in range(count)], height)
got = slice_root(digs, count, height)
assert got == want, "ragged slice MISMATCH"
print("ragged 1324@h11: ok", flush=True)
print("ALL OK", flush=True)
