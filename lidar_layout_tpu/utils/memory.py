"""Host RAM probe for memory-gated in-process caches.

Parity: the reference layout dataset instantiates a ``/proc/meminfo`` probe
(`lidm/data/helpers/psutil.py` ``FreeMemLinux``, constructed at
`nuscenes_layout_dataset.py:67`) intended to gate optional in-memory caching
of per-scene features. Here the probe is key-based (robust to meminfo line
reordering across kernels, unlike fixed line indices) and actually wired:
`data/nuscenes_layout.py` uses :func:`available_gb` to decide whether to keep
CLIP feature pickles resident.
"""
from __future__ import annotations

from typing import Dict

_MEMINFO = "/proc/meminfo"


def meminfo(path: str = _MEMINFO) -> Dict[str, float]:
    """Parse /proc/meminfo into {key: kB}. Empty dict if unreadable."""
    out: Dict[str, float] = {}
    try:
        with open(path) as f:
            for line in f:
                key, _, rest = line.partition(":")
                parts = rest.split()
                if parts:
                    out[key.strip()] = float(parts[0])
    except OSError:
        pass
    return out


def available_gb(path: str = _MEMINFO) -> float:
    """Memory available for new allocations without swapping, in GB.

    Prefers the kernel's MemAvailable estimate; falls back to
    free + buffers + cached on old kernels; 0.0 when unreadable (callers
    then skip caching — the safe default).
    """
    info = meminfo(path)
    kb = info.get("MemAvailable")
    if kb is None:
        kb = (info.get("MemFree", 0.0) + info.get("Buffers", 0.0)
              + info.get("Cached", 0.0))
    return kb / (1024.0 * 1024.0)


def total_gb(path: str = _MEMINFO) -> float:
    return meminfo(path).get("MemTotal", 0.0) / (1024.0 * 1024.0)
