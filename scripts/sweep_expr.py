"""Fresh-seed sweep of the SPARK EXPRESSION path against the kernel.

The compiled-reference sweeps (scripts/sweep_reference.py) pin the
Python kernel to the reference at fresh seeds; the expression-path
fuzz (tests/test_expr_fuzz.py) pins the Column-expression compiler to
the kernel — but only at the per-commit FIXED seeds. This script is
the fresh-seed ritual for that second link: the plan that actually
runs at 10^12 rows is the expression path, so "was that luck?" must
be answerable for it too.

Every expressible generated schema becomes one boolean column of a
single DataFrame per (draft, seed) batch — one Spark job evaluates
hundreds of schemas over shared instances, so a sweep of tens of
thousands of comparisons stays in minutes on local[8].

Usage: python scripts/sweep_expr.py [n_seeds] [base_seed]
Prints one line per (draft, seed) and a final total; exit 1 on any
mismatch.
"""

from __future__ import annotations

import json
import pathlib
import random
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from json_schema_spark.plans.compiler import ExprUnsupported  # noqa: E402
from json_schema_spark.plans.runner import SparkValidator  # noqa: E402
from json_schema_spark.session import get_spark  # noqa: E402
from tests import differential_gen as G  # noqa: E402

N_SCHEMAS = 150  # per (draft, seed) batch
N_INSTANCES = 40  # shared instances per batch (plus targeted ones)
_DRAFTS = ("draft7", "2019-09", "2020-12")


def sweep_batch(spark, dialect: str, seed: int) -> tuple[int, int]:
    rng = random.Random(f"expr-sweep-{dialect}-{seed}")

    validators, cols = [], []
    tried = 0
    schemas = []
    while len(validators) < N_SCHEMAS and tried < N_SCHEMAS * 4:
        tried += 1
        schema = G.schema(rng, dialect, depth=3, top=True)
        try:
            v = SparkValidator(schema, dialect=dialect)
            valid_col, _ = v.json_columns(F.col("doc"))
        except ExprUnsupported:
            continue
        except Exception:
            continue  # generator artifact the compiler rejects outright
        validators.append(v)
        schemas.append(schema)
        cols.append(valid_col.alias(f"v{len(cols)}"))

    # Shared blind instances + schema-aware ones (targeted_value steers
    # into the valid interior; mutate produces near-misses) so the
    # sweep exercises deep t/f boundaries, not just top-level type
    # mismatches.
    instances = [G.value(rng) for _ in range(N_INSTANCES)]
    for schema in schemas[:: max(1, len(schemas) // 20)]:
        t = G.targeted_value(rng, schema)
        instances.append(t)
        instances.append(G.mutate(rng, t, n_edits=1))
    docs = [json.dumps(v) for v in instances]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "i int, doc string"
    )

    total = mismatches = 0
    out = df.select("i", *cols).orderBy("i").collect()
    for row in out:
        i = row["i"]
        for k, v in enumerate(validators):
            got = row[f"v{k}"]
            want = v.kernel.is_valid_json(docs[i])
            total += 1
            if got is not want:
                mismatches += 1
                print(
                    "EXPR-MISMATCH",
                    json.dumps(v.schema),
                    docs[i],
                    "spark:",
                    got,
                    "kernel:",
                    want,
                )
    return total, mismatches


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 20260820
    spark = get_spark("sweep_expr", cores=8)
    total = mismatches = 0
    for seed in range(base, base + n):
        for dialect in _DRAFTS:
            t, m = sweep_batch(spark, dialect, seed)
            total += t
            mismatches += m
            print(f"{dialect} seed={seed}: {t} compared, {m} mismatches")
    print(f"TOTAL: {total} comparisons, {mismatches} mismatches")
    sys.exit(1 if mismatches else 0)


if __name__ == "__main__":
    main()
