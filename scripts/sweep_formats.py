"""Fresh-seed sweep of the format + content differentials against the
compiled reference — the scalar-function companion to
``sweep_reference.py`` (which sweeps keyword/verdict families). The
per-commit pytest fuzz runs fixed seeds; this answers "was that luck?"
for the 18 format validators and the content vocabulary, where round 3
found 5 real divergences at fixed seeds.

Usage: python scripts/sweep_formats.py [n_seeds] [base_seed]
"""

from __future__ import annotations

import json
import pathlib
import random
import sys
import tempfile

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from json_schema_spark.core.validator import compile_schema  # noqa: E402
from json_schema_spark.functions.formats import FORMAT_VALIDATORS  # noqa: E402
from tests import test_reference_differential as R  # noqa: E402
from tests import test_reference_format_fuzz as FF  # noqa: E402
from tests import test_reference_content_fuzz as CF  # noqa: E402


def sweep_formats(run, seed: int) -> tuple[int, int, list]:
    total = 0
    bad: list = []
    for fmt in sorted(FORMAT_VALIDATORS):
        rng = random.Random(f"fmt-{fmt}-sweep-{seed}")
        pool = list(FF.SEEDS.get(fmt, []))
        others = [s for k, v in FF.SEEDS.items() if k != fmt for s in v]
        pool += rng.sample(others, min(20, len(others)))
        reps = 10 if fmt in ("email", "idn-email", "hostname",
                             "idn-hostname") else 6
        for s in list(pool):
            for _ in range(reps):
                pool.append(FF._mutate(rng, s))
        schema = json.dumps({"format": fmt})
        got = run([(schema, json.dumps(s), "2020-12", True) for s in pool])
        mine = FORMAT_VALIDATORS[fmt]
        for s, g in zip(pool, got):
            if g == "e":
                continue  # reference crashed (uri-template {} defect)
            if fmt in ("idn-hostname", "idn-email") and FF._has_rtl(s):
                continue  # reference lacks RFC 5893 bidi rules; ours has them
            if fmt in ("hostname", "idn-hostname", "email", "idn-email") \
                    and FF._garbage_alabel(s):
                continue  # reference Punycode decodeDigit defect
            total += 1
            try:
                v = "t" if mine(s) else "f"
            except Exception as e:
                bad.append((fmt, s, g, f"raised {e!r}"))
                continue
            if v != g:
                bad.append((fmt, s, g, v))
    return total, len(bad), bad


def sweep_content(run, seed: int) -> tuple[int, int, list]:
    total = 0
    bad: list = []
    for name, schema, seeds in CF.CASES:
        rng = random.Random(f"content-{name}-sweep-{seed}")
        pool = list(seeds)
        for s in list(pool):
            for _ in range(8):
                pool.append(CF._mutate(rng, s))
        sj = json.dumps(schema)
        got = run([(sj, json.dumps(s), "draft7", False) for s in pool])
        kernel = compile_schema(schema, dialect="draft7")
        for s, g in zip(pool, got):
            total += 1
            mine = "t" if kernel.is_valid(s) else "f"
            if mine != g:
                bad.append((name, s, g, mine))
    return total, len(bad), bad


def main() -> None:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 777
    with tempfile.TemporaryDirectory() as tmp:
        run = R.build_reference_probe(pathlib.Path(tmp))
        gt = gm = 0
        for i in range(n_seeds):
            seed = base + i
            ft, fm, fbad = sweep_formats(run, seed)
            ct, cm, cbad = sweep_content(run, seed)
            gt += ft + ct
            gm += fm + cm
            print(f"seed {seed}: formats {ft} compared / {fm} mismatches; "
                  f"content {ct} compared / {cm} mismatches", flush=True)
            for row in (fbad + cbad)[:10]:
                print("  MISMATCH", row, flush=True)
        print(f"TOTAL: {gt} comparisons, {gm} mismatches")
        sys.exit(1 if gm else 0)


if __name__ == "__main__":
    main()
