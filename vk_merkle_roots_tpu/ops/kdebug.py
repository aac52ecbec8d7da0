"""In-kernel debug hooks — the ``pl.debug_print`` analog of the
``debugPrintfEXT`` hooks the reference leaves compiled into its shader
(``/root/reference/src/shaders/SHA-256.comp:2,269,432`` — enabled by the
validation layer on its Windows builds, SHA-256vk.cpp:59-73).

Set ``VKMR_KERNEL_DEBUG=1`` to have every hot kernel print one probe
scalar per grid step (first lane's digest word 0) — enough to localize
which kernel / grid step diverges when triaging on hardware, where the
differential tests can't see inside a fused program.  The flag is read at
TRACE time: compiled programs are cached per shape, so set it before the
first call of the shape you are debugging (in a fresh process or after
clearing the persistent cache).  Off by default and free: the hook is a
no-op at trace time, adding zero ops to the compiled kernel.

Works in both compiled Mosaic (real TPU) and interpret mode (CPU tests);
see docs/DESIGN.md "In-kernel debugging".
"""

from __future__ import annotations

import os


def active() -> bool:
    return bool(os.environ.get("VKMR_KERNEL_DEBUG"))


def emit(tag: str, value) -> None:
    """Print one scalar from inside a Pallas kernel body when
    ``VKMR_KERNEL_DEBUG`` is set; no-op otherwise."""
    if not active():
        return
    from jax.experimental import pallas as pl

    pl.debug_print(tag + " = {}", value)
