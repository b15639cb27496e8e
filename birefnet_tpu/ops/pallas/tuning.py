"""Per-device-generation tuning constants shared by the Pallas kernels.

The round-2 budgets (12MB qkv blocks, vmem_limit_bytes=100MB) were measured
10-30% faster than conservative ones on v5e — but they assume v5e's 128MB
VMEM. Earlier generations (v2/v3, 16-32MB) would fail to COMPILE with those
budgets rather than fall back, so the budgets are derived from the actual
device here (round-2 advisor finding).
"""

from __future__ import annotations

import functools

import jax


@functools.cache
def _vmem_bytes() -> int:
    """Physical VMEM of device 0; conservative default when unknown."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except RuntimeError:
        return 16 << 20
    # 128MB-class: v4, v5e ("v5 lite"), v5p, v6e ("trillium"). Unknown or
    # older (v2/v3) get the conservative 16MB-class budgets.
    if any(t in kind for t in ("v4", "v5", "v6", "trillium")):
        return 128 << 20
    return 16 << 20


def vmem_limit_bytes() -> int:
    """CompilerParams.vmem_limit_bytes: most of VMEM, capped at 100MB."""
    return min(100 << 20, (_vmem_bytes() * 3) // 4)


def block_budget_bytes() -> int:
    """Budget for a kernel's main input block (measured 12MB on v5e)."""
    return (12 << 20) if _vmem_bytes() >= (64 << 20) else (3 << 20)
