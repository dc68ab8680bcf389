#!/usr/bin/env python3
"""Fixed-work host-health probe for gating ingest capacity attempts.

Spawns N threads each running an identical fixed spin (multiprocessing,
so the GIL doesn't serialize) and prints single-thread seconds,
parallel wall seconds, and the parallel/single ratio. On an idle
32-vcpu host the ratio is ~1; an external CPU-starvation window
inflates the parallel wall time well past it. Exit code 0 when
parallel_sec <= threshold (arg 1, default 4.0), 1 otherwise — so
shell gates can `host_probe.py && attempt`.
"""
import sys, time, multiprocessing as mp

def spin(_):
    x = 0
    for i in range(10_000_000):
        x ^= i * 2654435761 % 1000003
    return x

def main():
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    t0 = time.perf_counter(); spin(0); single = time.perf_counter() - t0
    t0 = time.perf_counter()
    with mp.Pool(n) as p:
        p.map(spin, range(n))
    par = time.perf_counter() - t0
    print(f'{{"single_sec":{single:.2f},"parallel_sec":{par:.2f},'
          f'"threads":{n},"ratio":{par/single:.2f}}}')
    sys.exit(0 if par <= threshold else 1)

if __name__ == "__main__":
    main()
