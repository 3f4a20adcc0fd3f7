"""Cross-implementation conformance: this engine's kernel vs the
independent ``jsonschema`` library (a mature implementation of the same
specs), over (a) the hand-written conformance corpus and (b) a large
deterministic randomly-generated corpus.

The official JSON-Schema-Test-Suite is not fetchable in this sandbox
(no network); this differential harness is the substitute confidence
signal the reference gets from running the org suite wholesale
(``JsonSchemaOrgTests.java:26-154``): two unrelated implementations
agreeing on tens of thousands of verdicts across three drafts.
"""

from __future__ import annotations

import json
import pathlib
import random

import pytest

jsonschema = pytest.importorskip("jsonschema")

from json_schema_spark.core.validator import CompileConfig, compile_schema  # noqa: E402
from tests import differential_gen as G  # noqa: E402

SUITE_DIR = pathlib.Path(__file__).parent / "suite"

_LIB_VALIDATORS = {
    "draft7": jsonschema.Draft7Validator,
    "2019-09": jsonschema.Draft201909Validator,
    "2020-12": jsonschema.Draft202012Validator,
}
_DIR_DIALECT = {"draft7": "draft7", "draft2019": "2019-09", "draft2020": "2020-12"}

# corpus files exercising behaviors where the library deliberately
# differs from the reference semantics this engine implements: format
# assertions (forced on in those files), content vocabulary (library
# never asserts), and IDN tables (library needs optional deps)
_SKIP_FILES = ("format", "content", "idn", "javaregex", "absorb")
# "absorb": reference absorb-and-skip unevaluated* semantics (see
# _absorb_skip_possible) — corpus cases there pin the REFERENCE
# behavior, which the spec-following library contradicts
# "javaregex": the engine follows the reference's java.util.regex
# anchoring ($ / \Z tolerate one final line terminator incl. \r\n);
# the library uses Python re, whose $ tolerates only \n


def _has_decimal_multiple_of(node) -> bool:
    """The engine follows the reference's exact-decimal ``multipleOf``
    (``MultipleOfCompiler.java:36-43``); the library uses binary floats
    and gets e.g. 19.99 % 0.01 wrong — documented divergence."""
    if isinstance(node, dict):
        m = node.get("multipleOf")
        if isinstance(m, float) and not m.is_integer():
            return True
        return any(_has_decimal_multiple_of(v) for v in node.values())
    if isinstance(node, list):
        return any(_has_decimal_multiple_of(v) for v in node)
    return False


def _contains_keys(node, keys: set) -> set:
    found = set()
    if isinstance(node, dict):
        found |= keys & set(node)
        for v in node.values():
            found |= _contains_keys(v, keys)
    elif isinstance(node, list):
        for v in node:
            found |= _contains_keys(v, keys)
    return found


_ABSORBED_INPLACE = {"$ref", "allOf", "anyOf", "oneOf", "not", "if",
                     "dependentSchemas"}


def _absorb_skip_possible(schema) -> bool:
    """Reference absorb-and-skip (kernel ``_absorb_group``,
    UnevaluatedItemsCompiler.java:106-118): an unevaluated* keyword
    absorbs its node's in-place applicators and SKIPS them for
    wrong-typed instances; the library follows the spec and always
    applies them. Verdict differences on such schemas are the
    reference-verified divergence, not a bug — filter them."""
    if isinstance(schema, dict):
        if ({"unevaluatedItems", "unevaluatedProperties"} & schema.keys()
                and _ABSORBED_INPLACE & schema.keys()):
            return True
        return any(_absorb_skip_possible(v) for v in schema.values())
    if isinstance(schema, list):
        return any(_absorb_skip_possible(v) for v in schema)
    return False


def _lib_2019_uneval_quirk(schema) -> bool:
    """jsonschema's Draft201909Validator does not feed
    ``additionalProperties`` annotations into ``unevaluatedProperties``
    (its 2020-12 path and this kernel both do, matching the spec and the
    official suite's 'adjacent additionalProperties' case) — skip that
    combination when comparing against the library's 2019-09 mode."""
    hit = _contains_keys(
        schema, {"unevaluatedProperties", "unevaluatedItems",
                 "additionalProperties", "additionalItems"}
    )
    return bool(hit & {"unevaluatedProperties", "unevaluatedItems"}) and bool(
        hit & {"additionalProperties", "additionalItems"}
    )


def _corpus_cases():
    for sub, dialect in _DIR_DIALECT.items():
        d = SUITE_DIR / sub
        if not d.is_dir():
            continue
        for f in sorted(d.glob("*.json")):
            if any(tok in f.name for tok in _SKIP_FILES):
                continue
            for group in json.loads(f.read_text()):
                yield f.name, dialect, group


# Reference-verified divergences from the json-schema SPEC (and hence
# from the library): the reference's uniqueItems is a HashSet<JsonNode>
# and its const is Jackson-strict below the top level, so a number's
# FAMILY (integer vs decimal lexeme) is part of its identity — the spec
# says 1 == 1.0 everywhere. Pinned against the COMPILED reference by
# tests/test_reference_differential.py; the engine follows the
# reference (the brief), the library follows the spec.
_REFERENCE_STRICT_EQUALITY = {
    ("const object",
     "nested numbers are family-strict (tolerance is top-level only)"),
    ("const object deep equality", "nested numeric family mismatch rejected"),
    ("uniqueItems deep equality semantics",
     "1 and 1.0 are NOT duplicates (strict Jackson equality)"),
    ("uniqueItems deep equality semantics",
     "nested 1 vs 1.0 are NOT duplicates"),
    ("uniqueItems", "1 and 1.0 differ by number family (Jackson strict equality)"),
    ("uniqueItems", "nested family mismatch keeps objects distinct"),
}


def _family_divergence_possible(schema, doc) -> bool:
    """True when strict-vs-spec numeric equality could explain a
    kernel/library verdict difference: the schema involves uniqueItems
    or const and two mathematically-equal numbers of different families
    (int vs float) appear in play."""
    def nums(v, out):
        if isinstance(v, bool):
            return
        if isinstance(v, (int, float)):
            out.append(v)
        elif isinstance(v, list):
            for x in v:
                nums(x, out)
        elif isinstance(v, dict):
            for x in v.values():
                nums(x, out)

    def has_kw(s):
        if isinstance(s, dict):
            if "uniqueItems" in s or "const" in s:
                return True
            return any(has_kw(v) for v in s.values())
        if isinstance(s, list):
            return any(has_kw(v) for v in s)
        return False

    if not has_kw(schema):
        return False
    pool: list = []
    nums(doc, pool)
    nums(schema, pool)
    ints = {x for x in pool if isinstance(x, int)}
    floats = {x for x in pool if isinstance(x, float)}
    return any(float(i) in floats for i in ints)


@pytest.mark.parametrize(
    "fname,dialect,group",
    list(_corpus_cases()),
    ids=lambda v: v if isinstance(v, str) else getattr(v, "get", lambda *_: "")("description"),
)
def test_library_agrees_on_corpus(fname, dialect, group):
    """Every hand-written corpus verdict must match the independent
    library (cases the library cannot process — e.g. unregistered remote
    refs — are skipped, not ignored silently)."""
    schema = group["schema"]
    if _has_decimal_multiple_of(schema):
        pytest.skip("exact-decimal multipleOf: library uses binary floats")
    try:
        lib = _LIB_VALIDATORS[dialect](schema)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"library cannot compile: {e}")
    for case in group["tests"]:
        if (group["description"], case["description"]) in _REFERENCE_STRICT_EQUALITY:
            continue  # reference-verified spec divergence (see above)
        try:
            lib_ok = lib.is_valid(case["data"])
        except Exception as e:
            pytest.skip(f"library cannot evaluate: {e}")
        assert lib_ok == case["valid"], (
            f"{fname}: library disagrees with corpus verdict on "
            f"{case['description']!r}: schema={schema!r} data={case['data']!r}"
        )


@pytest.mark.parametrize("dialect", ["draft7", "2019-09", "2020-12"])
@pytest.mark.parametrize("seed", [11, 23, 37])
def test_generated_differential(dialect, seed):
    """~500 random schemas × 10 random instances per (dialect, seed):
    kernel verdict must equal the library verdict on every single one."""
    rng = random.Random(f"{dialect}-{seed}")
    lib_cls = _LIB_VALIDATORS[dialect]
    cfg = CompileConfig(dialect=dialect, content_mode="disabled")
    checked = 0
    for i in range(500):
        schema = G.schema(rng, dialect, depth=3 + (i % 2), top=True)
        if dialect == "2019-09" and _lib_2019_uneval_quirk(schema):
            continue
        try:
            lib = lib_cls(schema)
            lib_cls.check_schema(schema)
        except Exception:
            continue  # generator produced something the library rejects
        try:
            kernel = compile_schema(schema, dialect=dialect,
                                    config=CompileConfig(**vars(cfg)))
        except Exception as e:
            # reference-verified compile rejections the library does not
            # perform (EnumCompiler throws on tolerant-duplicate enum
            # members like [1, 1.0]; someOf requires non-empty arrays)
            assert "duplicate members" in str(e) or "non-empty array" in str(e), (
                f"unexpected kernel compile rejection: {e}\n{json.dumps(schema)}")
            continue
        for _ in range(10):
            inst = G.value(rng)
            try:
                lib_ok = lib.is_valid(inst)
            except Exception:
                # library crash (e.g. its 2019-09 unevaluatedItems
                # helper does len(schema["items"]) and dies on
                # boolean-form items) — nothing to compare against
                continue
            ker_ok = kernel.is_valid(inst)
            if ker_ok != lib_ok and (
                _family_divergence_possible(schema, inst)
                or _absorb_skip_possible(schema)
            ):
                # reference-verified divergences: Jackson-strict numeric
                # equality (uniqueItems/const) or absorb-and-skip
                # unevaluated* semantics
                continue
            assert ker_ok == lib_ok, (
                f"dialect={dialect} seed={seed} schema#{i}\n"
                f"schema={json.dumps(schema)}\ninstance={json.dumps(inst)}\n"
                f"kernel={ker_ok} library={lib_ok}"
            )
            checked += 1
    assert checked > 3000  # the harness actually exercised the engines


@pytest.mark.parametrize("dialect", ["draft7", "2019-09", "2020-12"])
@pytest.mark.parametrize("seed", [51])
def test_targeted_generated_differential(dialect, seed):
    """Schema-aware instances (G.targeted_value + G.mutate): verdicts
    at the deep t/f boundary that blind instances rarely reach. Same
    documented-divergence filters as the blind variant."""
    rng = random.Random(f"targeted-{dialect}-{seed}")
    lib_cls = _LIB_VALIDATORS[dialect]
    cfg = CompileConfig(dialect=dialect, content_mode="disabled")
    checked = 0
    for i in range(400):
        schema = G.schema(rng, dialect, depth=3 + (i % 2), top=True)
        if dialect == "2019-09" and _lib_2019_uneval_quirk(schema):
            continue
        try:
            lib = lib_cls(schema)
            lib_cls.check_schema(schema)
        except Exception:
            continue
        try:
            kernel = compile_schema(schema, dialect=dialect,
                                    config=CompileConfig(**vars(cfg)))
        except Exception:
            continue  # kernel-only rejections covered by the blind test
        docs = [G.targeted_value(rng, schema) for _ in range(3)]
        docs += [G.mutate(rng, d, n_edits=1 + (rng.random() < 0.4))
                 for d in docs]
        for inst in docs:
            try:
                lib_ok = lib.is_valid(inst)
            except Exception:
                continue
            ker_ok = kernel.is_valid(inst)
            if ker_ok != lib_ok and (
                _family_divergence_possible(schema, inst)
                or _absorb_skip_possible(schema)
            ):
                continue
            assert ker_ok == lib_ok, (
                f"dialect={dialect} seed={seed} schema#{i}\n"
                f"schema={json.dumps(schema)}\ninstance={json.dumps(inst)}\n"
                f"kernel={ker_ok} library={lib_ok}"
            )
            checked += 1
    assert checked > 1500
