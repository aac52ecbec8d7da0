"""Multi-process (multi-host analog) execution: 2 CPU-backend processes
rendezvous via ``jax.distributed.initialize`` and compute a sharded root
with real cross-process collectives (Gloo), proving the DCN path end-to-end
without a pod (SURVEY.md §5.8; BASELINE's 2-host north star).

The reference has no distributed story at all (SURVEY.md §2.4) — this is
capability the TPU framework adds.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from vk_merkle_roots_tpu import oracle


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_root(tmp_path):
    """Spawn 2 processes x 4 virtual CPU devices; each contributes its shard
    of a deterministic 8192-leaf stream; both must print the oracle root for
    the sharded hash+reduce AND the digest-level sharded reduction."""
    port = _free_port()
    n_leaves, leaf_bytes, seed = 8192, 24, 7
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-m",
                "vk_merkle_roots_tpu.parallel.distributed",
                "--coordinator",
                f"localhost:{port}",
                "--num-processes",
                "2",
                "--process-id",
                str(pid),
                "--leaves",
                str(n_leaves),
                "--leaf-bytes",
                str(leaf_bytes),
                "--seed",
                str(seed),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    rng = np.random.default_rng(seed)
    leaves = [
        rng.integers(32, 126, size=leaf_bytes, dtype=np.uint8).tobytes()
        for _ in range(n_leaves)
    ]
    want = oracle.merkle_root(leaves).hex()
    for out in outs:
        lines = dict(
            l.split(maxsplit=1)
            for l in out.strip().splitlines()
            if l.startswith(("sharded_root ", "sharded_reduce_root "))
        )
        assert lines.get("sharded_root") == want, out
        assert lines.get("sharded_reduce_root") == want, out
