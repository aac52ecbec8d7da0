"""Engine registry — library-level parity with the reference's
``VkSha256D`` device registry (``/root/reference/src/vkmr/
SHA-256vk.h:31-52``: ``Available()`` lists engine names, ``Has(name)``
checks, ``Get(name)`` vends an engine instance)."""

from __future__ import annotations

from ..config import EngineConfig
from .base import Sha256dEngine
from .cpu import CpuSha256D


def Available() -> list[str]:
    """Engine names usable right now: the serial CPU oracle, each
    accelerator device kind, the generic XLA device pipeline, and MESH when
    more than one device exists."""
    names = ["CPU"]
    try:
        import jax

        devs = jax.devices()
        names += sorted({d.device_kind for d in devs if d.platform != "cpu"})
        names.append("XLA")
        if len(devs) > 1:
            names.append("MESH")
    except Exception:
        pass
    return names


def _accelerators(names: list[str]) -> list[str]:
    return [n for n in names if n not in ("CPU", "XLA", "MESH")]


def Has(name: str) -> bool:
    names = Available()
    if name == "TPU":
        return bool(_accelerators(names))
    return name in names


def Get(name: str, config: EngineConfig | None = None) -> Sha256dEngine:
    """Vend an engine by name (accepts the "TPU" alias for the first
    accelerator kind)."""
    names = Available()
    if name == "TPU":
        accel = _accelerators(names)
        if not accel:
            raise KeyError("no accelerator device available")
        name = accel[0]
    if name not in names:
        raise KeyError(f"unknown engine {name!r}; available: {names}")
    if name == "CPU":
        return CpuSha256D()
    if name == "MESH":
        from .mesh import MeshSha256D

        return MeshSha256D(config=config)
    from .tpu import TpuSha256D

    return TpuSha256D(name=name, config=config)
