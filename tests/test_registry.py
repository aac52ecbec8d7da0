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
    # Has and Get must agree on the TPU alias: it is present exactly when a
    # real accelerator kind is (MESH on a multi-device CPU host must not
    # inflate it).
    assert registry.Has("TPU") == bool(registry._accelerators(registry.Available()))
