#!/usr/bin/env python
"""Host-health probe for benchmark gating.

This sandbox VM's memory subsystem intermittently degrades ~75x on
fresh-page first-touch (hypervisor ballooning/EPT behavior): a 10M-element
int64 multiply over a FRESHLY allocated array was observed at 0.03s and at
3-4s on an otherwise idle box. Any wall-clock benchmark taken in a
degraded window is garbage, so every scaling/bench leg records this probe
and the harness refuses to run legs (or flags them) while degraded.

Probe = median over 3 samples of (fresh alloc + multiply). Healthy
threshold: < 0.15s (healthy windows measure ~0.03-0.05s; degraded ~2-4s).
"""

from __future__ import annotations

import json
import statistics
import time


def probe_once() -> float:
    import numpy as np

    a = np.arange(10_000_000, dtype=np.int64)  # fresh pages (first touch)
    t0 = time.time()
    b = a * 3
    dt = time.time() - t0
    del a, b
    return dt


def probe(samples: int = 3) -> float:
    return statistics.median(probe_once() for _ in range(samples))


HEALTHY_SEC = 0.15


def wait_healthy(timeout_sec: float = 900, poll_sec: float = 20) -> tuple[bool, float]:
    """Poll until the probe is healthy or timeout. Returns (healthy, last)."""
    deadline = time.time() + timeout_sec
    last = probe()
    while last >= HEALTHY_SEC and time.time() < deadline:
        time.sleep(poll_sec)
        last = probe()
    return last < HEALTHY_SEC, last


if __name__ == "__main__":
    print(json.dumps({"probe_sec": round(probe(), 4), "healthy_below": HEALTHY_SEC}))
