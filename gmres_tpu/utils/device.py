"""Device selection and capability report (setGPUdevice.cu:4-31 equivalent)."""

from __future__ import annotations

from typing import Optional

import jax

__all__ = ["select_device", "device_report"]


def select_device(platform: Optional[str] = None, index: int = 0):
    """Return the chosen jax device and set it as default."""
    devs = jax.devices(platform) if platform else jax.devices()
    if index >= len(devs):
        raise ValueError(f"device index {index} out of range ({len(devs)})")
    dev = devs[index]
    jax.config.update("jax_default_device", dev)
    return dev


def device_report() -> str:
    lines = [f"backend: {jax.default_backend()}"]
    for d in jax.devices():
        mem = getattr(d, "memory_stats", lambda: None)()
        extra = ""
        if mem:
            lim = mem.get("bytes_limit")
            if lim:
                extra = f", {lim / 2**30:.1f} GiB"
        lines.append(f"  [{d.id}] {d.device_kind} ({d.platform}{extra})")
    return "\n".join(lines)
