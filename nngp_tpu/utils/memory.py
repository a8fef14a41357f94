"""Host / device memory probes (replaces `/root/reference/util.py:17-24`,
which used pynvml/psutil; on TPU the interesting number is per-device HBM)."""

import jax


def memory_usage_gb() -> dict:
    out = {}
    try:
        import psutil
        out["host_rss_gb"] = psutil.Process().memory_info().rss / 1024 ** 3
    except ImportError:
        pass
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
            if stats and "bytes_in_use" in stats:
                out[f"{d.device_kind}:{d.id}_gb"] = stats["bytes_in_use"] / 1024 ** 3
        except Exception:
            pass
    return out
