"""Fresh-seed sweep of expression-path VIOLATION ENTRIES vs the kernel.

scripts/sweep_expr.py pins expr VERDICTS to the kernel at fresh
seeds; this pins the full error surface — multiset equality of
(json_pointer, keyword, message) triples — using the batched
comparator from tests/test_expr_violation_parity (its per-commit
seeds are fixed; this answers "was that luck?" for the
runtime-addressed entry compiler too).

Usage: python scripts/sweep_viol_parity.py [n_seeds] [base_seed]
Prints one line per (dialect, seed); exits 1 on any mismatch
(_compare asserts internally).
"""

from __future__ import annotations

import json
import pathlib
import random
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from json_schema_spark.session import get_spark  # noqa: E402
from tests import differential_gen as G  # noqa: E402
from tests.test_expr_violation_parity import _compare  # noqa: E402

_DIALECTS = ("draft7", "2019-09", "2020-12")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 20260821
    spark = get_spark(cores=8)
    total = 0
    failures = 0
    for seed in range(base, base + n):
        for dialect in _DIALECTS:
            rng = random.Random(f"viol-sweep-{dialect}-{seed}")
            cases, tried = [], 0
            while len(cases) < 80 and tried < 500:
                tried += 1
                schema = G.schema(rng, dialect, depth=3, top=True)
                docs = [json.dumps(G.value(rng)) for _ in range(5)]
                t = G.targeted_value(rng, schema)
                docs.append(json.dumps(t))
                docs.append(json.dumps(G.mutate(rng, t, n_edits=1)))
                docs.append(json.dumps(G.mutate(rng, t, n_edits=2)))
                cases.append((schema, docs))
            try:
                checked = _compare(spark, cases, dialect)
            except AssertionError as exc:
                failures += 1
                print(f"FAIL {dialect} seed={seed}: {exc}")
                continue
            total += checked
            print(f"ok {dialect} seed={seed}: {checked} failing docs matched")
    print(f"TOTAL: {total} failing docs, {failures} failing batches")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
