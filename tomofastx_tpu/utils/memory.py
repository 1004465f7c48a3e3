"""Memory usage reporting.

Counterpart of utils/memory_tools.F90 (host Pss from /proc summed over
ranks); here we report both host RSS and per-device HBM statistics, which
is the number that actually matters on TPU."""

from __future__ import annotations


def host_memory_gb() -> float:
    """Host proportional-set-size in GB (memory_tools.F90:37-79 reads Pss
    from /proc/self/smaps_rollup)."""
    try:
        with open("/proc/self/smaps_rollup") as f:
            for line in f:
                if line.startswith("Pss:"):
                    return float(line.split()[1]) / 1024**2
    except OSError:
        pass
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return float(line.split()[1]) / 1024**2
    except OSError:
        pass
    return 0.0


def device_memory_stats() -> list:
    """Per-device memory stats (bytes in use / limit) where the backend
    exposes them."""
    import jax

    out = []
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out.append(
                {
                    "device": str(d),
                    "bytes_in_use": s.get("bytes_in_use"),
                    "bytes_limit": s.get("bytes_limit"),
                }
            )
        except Exception:
            out.append({"device": str(d), "bytes_in_use": None, "bytes_limit": None})
    return out


def report(prefix: str = "") -> str:
    lines = [f"{prefix}MEMORY USED (host) [GB] = {host_memory_gb():.3f}"]
    for s in device_memory_stats():
        if s["bytes_in_use"] is not None:
            lines.append(
                f"{prefix}MEMORY USED ({s['device']}) [GB] = "
                f"{s['bytes_in_use'] / 1024**3:.3f} / {(s['bytes_limit'] or 0) / 1024**3:.3f}"
            )
    return "\n".join(lines)
