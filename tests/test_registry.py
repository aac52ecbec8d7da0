"""Engine registry (Available/Has/Get, VkSha256D parity)."""

import pytest

from vk_merkle_roots_tpu.models import registry
from vk_merkle_roots_tpu.models.cpu import CpuSha256D


def test_available_contains_core_engines():
    names = registry.Available()
    assert "CPU" in names and "XLA" in names


def test_get_cpu():
    e = registry.Get("CPU")
    assert isinstance(e, CpuSha256D)
    assert e.Name() == "CPU"


def test_get_xla_device_engine(rng):
    e = registry.Get("XLA")
    assert e.Add(b"x")
    assert len(e.Root()) == 64


def test_get_mesh_when_multidevice():
    import jax

    if len(jax.devices()) > 1:
        assert "MESH" in registry.Available()
        e = registry.Get("MESH")
        assert e.Stats()["devices"] > 1


def test_unknown_engine_raises():
    with pytest.raises(KeyError):
        registry.Get("NoSuchThing")


def test_has():
    assert registry.Has("CPU")
    assert not registry.Has("NoSuchThing")
    # Has("TPU") must not be inflated by MESH/XLA rows on an accelerator-free
    # host (it used to key off len(Available()) > 2): pin Available to the
    # multi-device CPU shape and check both Has and Get agree it's absent.
    import pytest

    monkeypatch = pytest.MonkeyPatch()
    try:
        monkeypatch.setattr(registry, "Available", lambda: ["CPU", "XLA", "MESH"])
        assert not registry.Has("TPU")
        with pytest.raises(KeyError):
            registry.Get("TPU")
        monkeypatch.setattr(registry, "Available", lambda: ["CPU", "TPU v5 lite", "XLA"])
        assert registry.Has("TPU")
    finally:
        monkeypatch.undo()
