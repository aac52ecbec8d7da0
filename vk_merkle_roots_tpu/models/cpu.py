"""Serial CPU engine — the correctness oracle backend.

Equivalent of the reference's ``CpuSha256D``
(``/root/reference/src/vkmr/SHA-256plus.cpp:491-563``): leaves are hashed as
they arrive, the tree is reduced level-by-level at ``Root()`` with the
odd-self-pair rule.  Hashing is delegated to ``hashlib`` (OpenSSL, typically
SHA-NI accelerated) with an optional native C++ bulk path; either way the
result is byte-exact FIPS-180 SHA-256d.
"""

from __future__ import annotations

from .. import oracle
from ..constants import MAX_LEAF_BYTES
from .base import Sha256dEngine


class CpuSha256D(Sha256dEngine):
    def __init__(self, name: str = "CPU") -> None:
        super().__init__(name)
        self._digests: list[bytes] = []

    def Add(self, data: bytes) -> bool:
        if len(data) > MAX_LEAF_BYTES:
            return False
        self._digests.append(oracle.leaf_hash(data))
        return True

    def AddMany(self, leaves) -> bool:
        leaves = list(leaves)
        if any(len(x) > MAX_LEAF_BYTES for x in leaves):
            return False
        try:
            from ..native.lib import native_leaf_hashes

            digests = native_leaf_hashes(leaves)
            if digests is not None:
                self._digests.extend(digests)
                return True
        except Exception:
            pass
        return super().AddMany(leaves)

    def AddSpans(self, data, offsets, lengths) -> bool:
        import numpy as np

        lengths = np.asarray(lengths)
        if lengths.size and int(lengths.max()) > MAX_LEAF_BYTES:
            return False
        try:
            from ..native.lib import native_leaf_hashes_spans

            out = native_leaf_hashes_spans(np.asarray(data, np.uint8), np.asarray(offsets), lengths)
            if out is not None:
                self._digests.extend(out[i].tobytes() for i in range(out.shape[0]))
                return True
        except Exception:
            pass
        return super().AddSpans(data, offsets, lengths)

    def Root(self) -> str:
        if not self._digests:
            return ""
        try:
            import numpy as np

            from ..native.lib import native_merkle_root

            arr = np.frombuffer(b"".join(self._digests), np.uint8).reshape(-1, 32)
            root = native_merkle_root(arr)
            if root is not None:
                return root.hex()
        except Exception:
            pass
        return oracle.merkle_root_of_digests(self._digests).hex()

    def Proof(self, index: int) -> list[tuple[bytes, str]]:
        return oracle.merkle_proof_of_digests(self._digests, index)

    def Reset(self) -> bool:
        self._digests.clear()
        return True

    def Stats(self) -> dict:
        return {"leaves": len(self._digests)}
