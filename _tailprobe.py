import time
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from vk_merkle_roots_tpu.ops.tree_reduce import _bitrev, _tail_reduce_pallas
rng = np.random.default_rng(4)
digs = rng.integers(0, 1<<32, size=(1024,8), dtype=np.uint32)
fold = jnp.asarray(digs[_bitrev(10)]).T

@partial(jax.jit, static_argnums=(1,))
def step(w, iters):
    def body(_, carry):
        w, acc = carry
        root = _tail_reduce_pallas(w, 10, False)
        w = w.at[0, 0].add(root[0])
        return (w, acc ^ root[1])
    return jax.lax.fori_loop(0, iters, body, (w, jnp.uint32(0)))

_ = np.asarray(step(fold, 1)[1])
for iters in (2000, 2000, 2000):
    t0 = time.perf_counter(); _ = np.asarray(step(fold, iters)[1]); t1 = time.perf_counter()
    t0b = time.perf_counter(); _ = np.asarray(step(fold, 0)[1]); t1b = time.perf_counter()
    us = ((t1-t0) - (t1b-t0b)) / iters * 1e6
    print(f"fused tail: {us:.2f} us/block", flush=True)
