#!/usr/bin/env python3
"""Quick effective-core probe: 32 threads x 3s of MD5; prints cores-equiv.

The sandbox's 32 vCPUs are backed by a shared host; neighbor bursts cut the
effective budget to ~8 cores with zero visibility in loadavg (steal only
accrues under load). Gate measurements on this probe: >= 20 cores-equiv is
a clean window, <= 12 is contaminated.
"""
import time, threading, hashlib, sys

PER_CORE = 635.0  # MB/s single-thread MD5 on this box


def main():
    nt = 32
    stop = [False]
    out = [0] * nt

    def spin(i):
        b = b'x' * 1000000
        n = 0
        while not stop[0]:
            hashlib.md5(b)
            n += 1
        out[i] = n

    ts = [threading.Thread(target=spin, args=(i,)) for i in range(nt)]
    t0 = time.time()
    for t in ts:
        t.start()
    time.sleep(3)
    stop[0] = True
    for t in ts:
        t.join()
    dt = time.time() - t0
    cores = sum(out) / dt / PER_CORE
    print(f"{cores:.1f}")
    return 0 if cores >= 20 else 1


if __name__ == '__main__':
    sys.exit(main())
