"""Device selection and capability report (setGPUdevice.cu:4-31 equivalent)."""

from __future__ import annotations

from typing import Optional

import jax

__all__ = ["select_device", "device_report", "enable_compile_cache"]


def enable_compile_cache(path: Optional[str] = None) -> str:
    """Enable JAX's persistent compilation cache (repeat CLI runs skip the
    20-60 s XLA/Mosaic compiles; measured 155 s -> 103 s on the 100K-node
    PG transient). Honors JAX_COMPILATION_CACHE_DIR when already set."""
    import os

    path = (os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or path
            or os.path.join(os.path.expanduser("~"), ".cache",
                            "gmres_tpu", "jax_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path


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
