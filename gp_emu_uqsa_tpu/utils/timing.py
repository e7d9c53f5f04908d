"""Host-side op timing that survives the remote-TPU tunnel.

The axon relay adds a ~25 ms host<->device round-trip. The round-2 timers
enqueued a FIXED 8-10 reps asynchronously and subtracted one measured RTT;
for sub-millisecond ops that is 8*op ~ 2 ms inside a ~27 ms total — a 10%
RTT fluctuation then swings the reported op time by 100% (observed: the
same Pallas kernel "measured" 0.10 ms and 0.47 ms across identical runs).

`timed` fixes this by scaling reps until the on-device time dominates the
RTT (total - rtt >= min_total_s), so RTT noise is amortized below ~5%.
Sync is via a host scalar (block_until_ready under-reports on
remote-tunnel backends — see project memory). Total on-device time is kept
modest (default 0.4 s) because long device loops can wedge the relay.
"""
from __future__ import annotations

import time


def timed(fn, sync, *, min_total_s: float = 0.4, max_reps: int = 1024,
          start_reps: int = 8) -> float:
    """Per-op seconds of `fn` with RTT amortized; `sync(out)` must force a
    host-side materialization of fn's result."""
    out = fn()
    sync(out)                       # warm: compile + first dispatch
    t0 = time.perf_counter()
    sync(out)
    rtt = time.perf_counter() - t0
    reps = start_reps
    while True:
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        sync(out)
        total = time.perf_counter() - t0
        dev = total - rtt
        if dev >= min_total_s or reps >= max_reps:
            return max(dev / reps, 1e-9)
        est = max(dev / reps, 1e-7)
        reps = min(max_reps, max(reps * 2, int(min_total_s / est) + 1))
