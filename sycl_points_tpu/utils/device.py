"""Device selection helper (parity shim).

The reference selects SYCL devices by vendor/type strings with capability
checks (``utils/sycl_utils.hpp:398-465`` device_selector in
fateshelled/sycl_points).  Under JAX the runtime owns device discovery;
this helper keeps the same call shape for configuration compatibility and
exposes basic capability info (the analog of print_device_info).
"""

from __future__ import annotations

from typing import Optional

import jax


def select_device(vendor: str = "", type: str = "") -> jax.Device:
    """Pick a device matching platform substrings; TPU > GPU > CPU priority.

    ``vendor``/``type`` are matched case-insensitively against the platform
    and device-kind strings ("tpu", "gpu", "cpu", ...).
    """
    devs = jax.devices()
    want = f"{vendor} {type}".strip().lower()
    if want:
        for d in devs:
            hay = f"{d.platform} {getattr(d, 'device_kind', '')}".lower()
            if all(tok in hay for tok in want.split()):
                return d
    for platform in ("tpu", "gpu", "cpu"):
        for d in devs:
            if d.platform == platform:
                return d
    return devs[0]


def device_info(device: Optional[jax.Device] = None) -> dict:
    d = device or jax.devices()[0]
    info = {
        "platform": d.platform,
        "device_kind": getattr(d, "device_kind", "?"),
        "id": d.id,
        "process_index": d.process_index,
    }
    try:
        stats = d.memory_stats()
        if stats:
            info["bytes_limit"] = stats.get("bytes_limit")
            info["bytes_in_use"] = stats.get("bytes_in_use")
    except Exception:
        pass
    return info


def print_device_info():
    for d in jax.devices():
        print(device_info(d))
