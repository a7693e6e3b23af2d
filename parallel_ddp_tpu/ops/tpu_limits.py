"""Shared TPU resource-limit policy for the Pallas kernels.

One place for the scoped-VMEM ceiling the three kernel families request
(ops/pallas_rbd.py, ops/pallas_rollout.py, ops/pallas_riccati.py), so the
"how much VMEM may the compiler use" decision is made once and documented
once (ADVICE r3: the 100 MB number was copy-pasted per kernel and silently
assumed a v5e-class chip).

Physical VMEM per TensorCore by generation (public chip specs; the scaling
book's chip table): v2/v3 carry 16 MiB, v4 and later (v4/v5e/v5p/v6e)
carry 128 MiB.  The kernels themselves use a few hundred KB per grid step;
the raised ceiling exists purely so a scenario-vmapped batch grid dimension
(benchmarks/scaling.py B=256) can multi-buffer aggressively.  Requesting
more than physical VMEM is a compile error, hence the generation gate.

`ops/pallas_riccati.py` additionally keeps its own `_VMEM_BUDGET` (13 MiB)
Python-side gate: that is intentionally NOT this ceiling — it is the
conservative single-instance (non-batched) working-set bound above which the
fused backward sweep falls back to the XLA scan path rather than risk a
batched caller exhausting VMEM.
"""

import functools


@functools.lru_cache(maxsize=1)
def pallas_vmem_limit_bytes() -> int:
    """Scoped-VMEM ceiling to pass as CompilerParams(vmem_limit_bytes=...).

    80% of physical VMEM for the local device generation, capped at the
    100 MiB the kernels were tuned with on v5e.  On the CPU interpret path
    (tests) the value is irrelevant but must still be a valid literal.
    """
    import jax

    kind = ""
    try:
        devs = jax.local_devices()
        if devs:
            kind = devs[0].device_kind.lower()
    except Exception:  # noqa: BLE001 - backend probing must never fail a build
        pass
    if "v2" in kind or "v3" in kind:
        physical = 16 * 2**20
    else:
        # v4/v5e ("v5 lite")/v5p/v6e and the CPU interpret path
        physical = 128 * 2**20
    return min(100 * 2**20, int(physical * 0.8))
