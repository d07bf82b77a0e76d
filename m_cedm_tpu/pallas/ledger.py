"""Trace-time cost ledger for the Pallas kernels.

XLA's cost analysis reports flops=0 / bytes_accessed=0 for custom calls
(verified on-device: the trace's per-op args carry bytes_accessed: 0 for
every Mosaic kernel), so any roofline computed from it alone understates
both resources of a kernel-bearing program — BENCH_r02 vs r03's
irreconcilable `sampling_hbm_bw_util` came exactly from this.

Each kernel wrapper calls `track(flops, *arrays)` right before its
pallas_call with the EXECUTED matmul flops (the paired kernels' tap
matrices are half structural zeros, so executed = 2x algorithmic for the
convs — both numbers matter: algorithmic for useful-work MFU, executed for
distance-from-MXU-limit) and the operand/result arrays (HBM bytes: one
read per operand, one write per result; halo re-reads and VMEM-resident
scalars are noise at these sizes).

`track` is a no-op unless a measurement is active, and it runs at TRACE
time: callers (bench.py cost_analysis) must reset(), trace a FRESH jit
wrapper (a cached jit skips tracing and records nothing), read totals(),
then stop().
"""

_ACTIVE = False
_FLOPS = 0.0
_BYTES = 0.0


def reset():
    global _ACTIVE, _FLOPS, _BYTES
    _ACTIVE, _FLOPS, _BYTES = True, 0.0, 0.0


def stop():
    global _ACTIVE
    _ACTIVE = False


def totals():
    """(executed_matmul_flops, hbm_bytes) accumulated since reset()."""
    return _FLOPS, _BYTES


def _nbytes(a):
    try:
        import numpy as np

        return int(np.prod(a.shape)) * np.dtype(a.dtype).itemsize
    except Exception:
        return 0


def track(flops, *arrays):
    """Record one kernel invocation: executed matmul flops + the HBM bytes
    of every operand/result in `arrays` (arrays, ShapeDtypeStructs, or
    lists/tuples thereof; None entries are skipped)."""
    global _FLOPS, _BYTES
    if not _ACTIVE:
        return
    b = 0
    stack = list(arrays)
    while stack:
        a = stack.pop()
        if a is None:
            continue
        if isinstance(a, (list, tuple)):
            stack.extend(a)
            continue
        b += _nbytes(a)
    _FLOPS += float(flops)
    _BYTES += float(b)
