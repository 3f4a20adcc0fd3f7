"""Measure the host's parallel-CPU ceiling: a pure-CPU sha256 busy
loop at N and 4N processes. On an uncontended machine the 4N/N
throughput ratio is ~4.0; on this sandbox VM it measures ~3.1-3.6
(host overcommit), which bounds ANY wall-clock scaling measurement —
context for BASELINE.md's scaling-efficiency numbers.

Usage: python scripts/cpu_ceiling.py [N] [secs]   (default N=4, 6s)
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import sys
import time


def burn(secs: float) -> int:
    h = hashlib.sha256()
    data = b"x" * 4096
    t_end = time.perf_counter() + secs
    c = 0
    while time.perf_counter() < t_end:
        h.update(data)
        c += 1
    return c


def measure(procs: int, secs: float) -> float:
    with mp.Pool(procs) as p:
        res = p.map(burn, [secs] * procs)
    return sum(res) / secs


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 6.0
    n4 = n * 4
    # interleave twice to average machine drift
    tp = {n: [], n4: []}
    for _ in range(2):
        for procs in (n, n4):
            tp[procs].append(measure(procs, secs))
    best_n, best_n4 = max(tp[n]), max(tp[n4])
    print(json.dumps({
        "levels": [n, n4],
        "blocks_per_sec": {str(n): round(best_n), str(n4): round(best_n4)},
        "per_proc": {str(n): round(best_n / n), str(n4): round(best_n4 / n4)},
        "cpu_ceiling_efficiency": round((best_n4 / best_n) / 4, 3),
    }))


if __name__ == "__main__":
    main()
