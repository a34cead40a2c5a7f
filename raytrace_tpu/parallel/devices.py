"""Device discovery/selection — analogue of pick_physical_devices.

Reference: /root/reference/src/vulkan.h:68-110 filters physical devices by
required extension support and deduplicates by deviceID, then the caller
truncates to ``--gpus`` (src/ray_trace.cpp:954-956).  The JAX analogue
filters by platform capability and deduplicates by (platform, id).
"""

from __future__ import annotations

from typing import List, Optional

import jax


def pick_devices(count: Optional[int] = None, platform: Optional[str] = None) -> List:
    """Capable, deduplicated devices, truncated to ``count``.

    ``platform=None`` prefers accelerators when present (like the reference
    preferring RT-capable devices), falling back to whatever exists.
    """
    devices = jax.devices()
    if platform is not None:
        devices = [d for d in devices if d.platform == platform]
    else:
        accel = [d for d in devices if d.platform != "cpu"]
        devices = accel if accel else devices
    seen = set()
    out = []
    for d in devices:
        key = (d.platform, d.id)
        if key in seen:
            continue
        seen.add(key)
        out.append(d)
    if count is not None:
        out = out[:count]  # truncate, not elastic — ray_trace.cpp:954-956
    return out
