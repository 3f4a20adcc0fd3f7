"""Fresh-seed sweep of the compiled-reference differentials.

Reuses the build/probe machinery from tests/test_reference_differential
but with many fresh seeds — the round-close confidence ritual (the
per-commit pytest seeds are fixed; this answers "was that luck?").

Usage: python scripts/sweep_reference.py [n_seeds] [base_seed]
Prints one summary line per family and a final verdict-count total.
"""

from __future__ import annotations

import json
import pathlib
import random
import sys
import tempfile

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from tests import differential_gen as gen  # noqa: E402
from tests import test_reference_differential as R  # noqa: E402
from json_schema_spark.core.validator import (  # noqa: E402
    CompileConfig,
    SchemaCompileError,
    compile_schema,
)


def build(tmp: pathlib.Path):
    run = R.build_reference_probe(tmp)

    def run_plain(cases):
        return run(cases)  # verdict-only (kinds stripped by default)

    run_plain.with_kinds = lambda cases: run(cases, kinds=True)
    return run_plain


_DIALECT_URIS = ("http://json-schema.org/draft-07/schema#",
                 "https://json-schema.org/draft/2019-09/schema",
                 "https://json-schema.org/draft/2020-12/schema")


def _inject_nested_schema(rng, sch):
    """Drop a cross-dialect $schema into a random SUBSCHEMA: it must be
    inert in both engines (dialect resolves per document root only —
    reference-probe pinned; the jsonschema LIBRARY follows the spec
    instead, so this runs only in the reference-facing sweep)."""
    subs = []
    stack = [sch]
    while stack:
        n = stack.pop()
        if isinstance(n, dict):
            if n is not sch:
                subs.append(n)
            stack.extend(n.values())
        elif isinstance(n, list):
            stack.extend(n)
    if subs:
        rng.choice(subs)["$schema"] = rng.choice(_DIALECT_URIS)


def sweep_verdicts(run, seeds, taa=False):
    total = mismatches = 0
    for seed in seeds:
        for draft in ("draft7", "2019-09", "2020-12"):
            rng = random.Random(f"sweep-{draft}-{seed}-{taa}")
            cases, kernels = [], []
            for _ in range(200):
                sch = gen.schema(rng, draft, top=True)
                if isinstance(sch, dict) and rng.random() < 0.15:
                    _inject_nested_schema(rng, sch)
                try:
                    kernel = compile_schema(sch, config=CompileConfig(
                        dialect=draft, treat_as_array=taa))
                except Exception:
                    continue
                sj = json.dumps(sch)
                for _ in range(8):
                    doc = gen.value(rng)
                    cases.append((sj, json.dumps(doc), draft, False, taa))
                    kernels.append((kernel, sch, doc))
            verdicts = run(cases)
            for (kernel, sch, doc), got in zip(kernels, verdicts):
                if got not in ("t", "f"):
                    continue
                total += 1
                mine = "t" if kernel.is_valid(doc) else "f"
                if mine != got:
                    mismatches += 1
                    print("MISMATCH", json.dumps(sch), json.dumps(doc),
                          "ref:", got, "kernel:", mine)
    return total, mismatches


def sweep_targeted(run, seeds):
    """Schema-aware instances: synthesized-toward-valid + mutated
    near-misses — the deep t/f boundary blind fuzz can't reach."""
    total = mismatches = 0
    for seed in seeds:
        for draft in ("draft7", "2019-09", "2020-12"):
            rng = random.Random(f"targeted-sweep-{draft}-{seed}")
            cases, kernels = [], []
            for _ in range(200):
                sch = gen.schema(rng, draft, top=True)
                try:
                    kernel = compile_schema(sch, dialect=draft)
                except Exception:
                    continue
                sj = json.dumps(sch)
                docs = [gen.targeted_value(rng, sch) for _ in range(3)]
                docs += [gen.mutate(rng, d, n_edits=1 + (rng.random() < 0.4))
                         for d in docs]
                for doc in docs:
                    cases.append((sj, json.dumps(doc), draft, False))
                    kernels.append((kernel, sch, doc))
            verdicts = run(cases)
            for (kernel, sch, doc), got in zip(kernels, verdicts):
                if got not in ("t", "f"):
                    continue
                total += 1
                mine = "t" if kernel.is_valid(doc) else "f"
                if mine != got:
                    mismatches += 1
                    print("TARGETED-MISMATCH", json.dumps(sch),
                          json.dumps(doc), "ref:", got, "kernel:", mine)
    return total, mismatches


def sweep_scalar_functions(run, seeds):
    """Delegate to scripts/sweep_formats.py (formats + content — the
    scalar-function companion sweep) so one entry point covers every
    family with fresh seeds."""
    from scripts.sweep_formats import sweep_content, sweep_formats

    total = mismatches = 0
    for seed in seeds:
        for fam in (sweep_formats, sweep_content):
            t, m, bad = fam(run, seed)
            total += t
            mismatches += m
            for b in bad:
                print("SCALAR-MISMATCH", b)
    return total, mismatches


def sweep_messages(run, seeds):
    """Rendered (kind, pointer, message) triples on failing cases:
    every triple the reference emits must appear among the kernel's
    violations (subset gate, same as tests/test_error_messages.py —
    our extra applicator-context entries are by design). Fresh-seed
    ritual for the MessageFormat/Double.toString rendering layer."""
    from json_schema_spark.core.errors import error_kind_of

    total = mismatches = 0
    for seed in seeds:
        for draft in ("draft7", "2019-09", "2020-12"):
            rng = random.Random(f"msg-sweep-{draft}-{seed}")
            cases, kernels = [], []
            for _ in range(150):
                sch = gen.schema(rng, draft, top=True)
                try:
                    kernel = compile_schema(sch, dialect=draft)
                except Exception:
                    continue
                sj = json.dumps(sch)
                docs = [gen.value(rng) for _ in range(2)]
                t = gen.targeted_value(rng, sch)
                docs += [t, gen.mutate(rng, t, n_edits=1)]
                for doc in docs:
                    cases.append((sj, json.dumps(doc), draft, False))
                    kernels.append((kernel, sch, doc))
            verdicts = run.with_kinds(cases)
            for (kernel, sch, doc), got in zip(kernels, verdicts):
                if not got.startswith("f:"):
                    continue
                ok, errs = kernel.validate(doc)
                if ok:
                    continue  # verdict parity is sweep_verdicts' job
                total += 1
                ref_triples = R._ref_triples(got)
                mine = {(error_kind_of(kw, msg).name, path, msg)
                        for path, kw, msg in (errs or [])}
                if not ref_triples <= mine:
                    mismatches += 1
                    print("MESSAGE-MISMATCH", json.dumps(sch),
                          json.dumps(doc), "missing:",
                          sorted(ref_triples - mine)[:3])
    return total, mismatches


def sweep_compile(run, seeds):
    total = mismatches = 0
    bad_values = [None, True, -1, 0.5, "x", [], {}, [1, 1], ["a", "a"],
                  {"a": 1}, "   ", 2.0]
    for seed in seeds:
        rng = random.Random(f"compile-{seed}")
        cases = []
        for _ in range(300):
            sch = gen.schema(rng, "2020-12", top=True)
            if not isinstance(sch, dict) or not sch:
                continue
            kw = rng.choice(sorted(sch))
            sch = dict(sch)
            sch[kw] = rng.choice(bad_values)
            cases.append(sch)
        verdicts = run([(json.dumps(s), "1", "2020-12", False) for s in cases])
        for sch, got in zip(cases, verdicts):
            if got == "e":
                continue
            total += 1
            try:
                compile_schema(sch, dialect="2020-12")
                mine_rejects = False
            except SchemaCompileError:
                mine_rejects = True
            if mine_rejects != (got == "c"):
                mismatches += 1
                print("COMPILE-MISMATCH", json.dumps(sch), got,
                      "kernel-rejects" if mine_rejects else "kernel-accepts")
    return total, mismatches


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 20260818
    seeds = [base + i for i in range(n)]
    with tempfile.TemporaryDirectory() as tmp:
        run = build(pathlib.Path(tmp))
        t1, m1 = sweep_verdicts(run, seeds)
        print(f"verdicts: {t1} compared, {m1} mismatches")
        t2, m2 = sweep_verdicts(run, seeds[: max(2, n // 4)], taa=True)
        print(f"treat-as-array: {t2} compared, {m2} mismatches")
        t3, m3 = sweep_compile(run, seeds[: max(2, n // 2)])
        print(f"compile-reject: {t3} compared, {m3} mismatches")
        t4, m4 = sweep_targeted(run, seeds)
        print(f"targeted-instances: {t4} compared, {m4} mismatches")
        t5, m5 = sweep_scalar_functions(run, seeds[: max(2, n // 4)])
        print(f"formats+content: {t5} compared, {m5} mismatches")
        t6, m6 = sweep_messages(run, seeds[: max(2, n // 2)])
        print(f"message-triples: {t6} compared, {m6} mismatches")
        total_m = m1 + m2 + m3 + m4 + m5 + m6
        print(f"TOTAL: {t1 + t2 + t3 + t4 + t5 + t6} comparisons, "
              f"{total_m} mismatches")
        sys.exit(1 if total_m else 0)


if __name__ == "__main__":
    main()
