#!/usr/bin/env python3
"""Memory-bandwidth hammer for the BenchGate memgate probe (round 15).

Saturates the memory bus with N processes each memcpy-ing two 256 MiB
bytearrays back and forth (bytearray slice assignment is a C-speed
memcpy, so pure stdlib traffic is genuinely DRAM-bound). Used to prove
end-to-end that a Bench record produced under memory contention prints
`comparable:false, degraded:"memory"` — the r14 postmortem's missing
behavior. Driver-side tooling only; not part of the library.

Usage: python3 tools/memhammer.py [seconds=120] [procs=16]
"""
import multiprocessing
import sys
import time


def worker(stop_t: float) -> None:
    src = bytearray(256 << 20)
    dst = bytearray(256 << 20)
    while time.time() < stop_t:
        dst[:] = src
        src[:] = dst


if __name__ == "__main__":
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    stop = time.time() + secs
    ps = [multiprocessing.Process(target=worker, args=(stop,)) for _ in range(n)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
