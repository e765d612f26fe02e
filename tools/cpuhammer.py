#!/usr/bin/env python3
"""CPU hammer for the BenchGate cpugate probe (round 15).

Spins N processes on pure integer arithmetic to contend every core —
the CPU-side twin of tools/memhammer.py, used to calibrate and prove
the host_factor degradation gate. Driver-side tooling only.

Usage: python3 tools/cpuhammer.py [seconds=120] [procs=32]
"""
import multiprocessing
import sys
import time


def worker(stop_t: float) -> None:
    x = 1469598103934665603
    while time.time() < stop_t:
        for _ in range(100000):
            x = (x ^ 0xFF) * 1099511628211 & 0xFFFFFFFFFFFFFFFF


if __name__ == "__main__":
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    stop = time.time() + secs
    ps = [multiprocessing.Process(target=worker, args=(stop,)) for _ in range(n)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
