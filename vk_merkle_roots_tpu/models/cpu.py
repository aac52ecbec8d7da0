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
        try:
            from ..native.lib import native_leaf_hashes

            digests = native_leaf_hashes(leaves)
            if digests is not None:
                self._digests.extend(digests)
                return True
        except Exception:
            pass
        return super().AddMany(leaves)

    def Root(self) -> str:
        if not self._digests:
            return ""
        return oracle.merkle_root_of_digests(self._digests).hex()

    def Reset(self) -> bool:
        self._digests.clear()
        return True

    def Stats(self) -> dict:
        return {"leaves": len(self._digests)}
