"""Engine interface — the framework's equivalent of the reference's abstract
``vkmr::ISha256D`` (``/root/reference/src/vkmr/ISha256D.h:18-37``): an engine
accepts byte-string leaves one at a time (or in bulk) and produces the
lowercase-hex SHA-256d Merkle root of everything added since the last reset.
"""

from __future__ import annotations

import abc


class Sha256dEngine(abc.ABC):
    """Streaming SHA-256d Merkle-root engine.

    Contract (mirrors ISha256D.h:18-37 plus a bulk-ingest extension):

    * ``Add(data)``  — append one leaf; returns False when the engine can no
      longer accept input (resource exhaustion), which stops ingest cleanly
      (Vkmr.cpp:44-47).
    * ``AddMany(leaves)`` — bulk append; default implementation loops ``Add``.
    * ``Root()``     — drain all in-flight work and return the root as
      lowercase hex (empty string for an empty stream, SHA-256plus.cpp:494).
    * ``Reset()``    — drop all state, ready for a new stream.
    * ``Name()``     — human-readable engine/device name.
    """

    def __init__(self, name: str) -> None:
        self._name = name

    def Name(self) -> str:
        return self._name

    @abc.abstractmethod
    def Add(self, data: bytes) -> bool:
        ...

    def AddMany(self, leaves) -> bool:
        for leaf in leaves:
            if not self.Add(leaf):
                return False
        return True

    def AddSpans(self, data, offsets, lengths) -> bool:
        """Bulk ingest of (offset, length) spans over one byte buffer.
        Engines override with vectorized paths; the default loops ``Add``."""
        view = memoryview(bytes(data))
        for off, ln in zip(offsets, lengths):
            if not self.Add(bytes(view[int(off) : int(off) + int(ln)])):
                return False
        return True

    @abc.abstractmethod
    def Root(self) -> str:
        ...

    @abc.abstractmethod
    def Reset(self) -> bool:
        ...

    # Optional richer telemetry (the reference logs per-op timings to stdout;
    # we expose them structurally).
    def Stats(self) -> dict:
        return {}

    def Proof(self, index: int) -> list[tuple[bytes, str]]:
        """Authentication path for leaf ``index`` (bottom-up
        (sibling_digest, sibling_side) pairs).  Engines that support proofs
        override; call after ``Root()``."""
        raise NotImplementedError(f"{self.Name()} does not support proofs")
