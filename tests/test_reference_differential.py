"""Differential against the ACTUAL reference implementation.

The round-1 blocker was that the official JSON-Schema-Test-Suite is
unfetchable in this sandbox; the substitute was a differential against
the independent ``jsonschema`` library. This goes one better: compile
the reference itself (``/root/reference``, Java) and compare verdicts
directly — the strongest parity evidence available offline.

The reference needs two things this sandbox lacks, both replaced
WITHOUT touching its semantics:

* **reactor-core** (absent): ``tests/refjava/stub`` provides a
  synchronous, list-backed implementation of exactly the reactor API
  surface the reference uses (written from reactor's public API docs,
  not from reactor sources). Verdicts are pure functions of the data,
  so sequential evaluation returns what the reactive pipeline would.
  The tiny ``org.reactivestreams`` / ``org.jspecify`` interfaces are
  stubbed the same way.
* **Java 21** (sandbox has 17): ``_PATCHES`` below rewrites the
  Java-21-only API calls (SequencedCollection methods, virtual-thread
  executor, AutoCloseable HttpClient) to Java-17 equivalents in a TEMP
  COPY of the sources at build time. Each patch is a literal
  one-liner; none changes behavior.

Document-parse divergence (deliberate, probed): ``Schema.apply`` on a
MALFORMED document ("}{", "01") THROWS IllegalArgumentException — one
bad row would kill a table-scale job — and an EMPTY/whitespace string
parses to Jackson's MissingNode (matches no type: ``{}`` -> valid,
``{"type": ...}`` -> invalid, type-gated keywords no-op). The engine
instead returns verdict=false with a ``$parse`` violation for both:
the only usable row-wise semantics in a DataFrame engine. The
differentials below never emit empty or malformed instances
(``json.dumps`` output is always parseable), so this never masks a
real mismatch.

Known environment artifact: a ``$ref`` to the draft-07 meta-schema
needs network in the reference (its embedded resolver keys the $id
WITH the trailing ``#`` while ref resolution strips fragments, so only
http fetching saves it — 2019-09/2020-12 ids have no fragment and
resolve offline). Cases tripping that are asserted to fail with a
compile error rather than a wrong verdict.
"""

from __future__ import annotations

import base64
import glob
import json
import os
import pathlib
import random
import shutil
import subprocess

import pytest

from tests import differential_gen as gen

HERE = pathlib.Path(__file__).parent
REFERENCE = pathlib.Path("/root/reference")
JAVA_HOME = os.environ.get("JAVA_HOME", "")
JAVAC = shutil.which("javac") or os.path.join(JAVA_HOME, "bin", "javac")
JAVA = shutil.which("java") or os.path.join(JAVA_HOME, "bin", "java")
JACKSON = sorted(
    glob.glob("/opt/spark/jars/jackson-core-[0-9]*.jar")
    + glob.glob("/opt/spark/jars/jackson-databind-*.jar")
    + glob.glob("/opt/spark/jars/jackson-annotations-*.jar"))

pytestmark = pytest.mark.skipif(
    not (REFERENCE.is_dir() and JAVAC and os.path.exists(JAVAC)
         and len(JACKSON) == 3),
    reason="reference sources, JDK or jackson jars unavailable",
)

_PKG = "io/github/georgeakulov/json_schema"
# Java 21 -> 17 compatibility rewrites (behavior-preserving; see module
# docstring). Every (old, new) pair must apply or the build fails.
_PATCHES = [
    (f"{_PKG}/compilers/CompileConfig.java",
     "Executors.newVirtualThreadPerTaskExecutor()",
     "java.util.concurrent.ForkJoinPool.commonPool()"),
    (f"{_PKG}/dialects/Defaults.java",
     "DIALECT_ORDERS.reversed()",
     "refcompat.Compat.reversed(DIALECT_ORDERS)"),
    (f"{_PKG}/loaders/SchemasRegistry.java",
     "compileConfig.getResourceLoaders().reversed()",
     "refcompat.Compat.reversed(compileConfig.getResourceLoaders())"),
    (f"{_PKG}/loaders/BaseResourceLoader.java",
     "loaders.addFirst(loader)", "loaders.add(0, loader)"),
    (f"{_PKG}/common/content/CompositeContentValidationRegistry.java",
     "this.registryList.addFirst(registry)",
     "this.registryList.add(0, registry)"),
    (f"{_PKG}/common/content/CompositeContentValidationRegistry.java",
     "this.registryList.addLast(registry)",
     "this.registryList.add(registry)"),
    (f"{_PKG}/common/content/SimpleContentValidationRegistry.java",
     "this.contentTypeValidators.addFirst(validator)",
     "this.contentTypeValidators.add(0, validator)"),
    (f"{_PKG}/common/RangeCollections.java",
     "map.headMap(ceil.getKey(), true).reversed()",
     "map.headMap(ceil.getKey(), true).descendingMap()"),
    (f"{_PKG}/common/RangeCollections.java",
     "of.getFirst().min", "of.get(0).min"),
    (f"{_PKG}/common/RangeCollections.java",
     "of.getFirst().max", "of.get(0).max"),
    (f"{_PKG}/common/RangeCollections.java",
     "of.addFirst(map.remove(floor))", "of.add(0, map.remove(floor))"),
    (f"{_PKG}/common/email/InetAddressValidator.java",
     "octetList.removeFirst()", "octetList.remove(0)"),
    (f"{_PKG}/compilers/ContainsCompilerFactory.java",
     # explicit type witness: Java 17's javac fails to infer T here
     # (the reference builds with Java 21); semantics unchanged
     "return Flux.defer(() -> validator.validate(",
     "return Flux.<io.github.georgeakulov.json_schema.results"
     ".IValidationResult>defer(() -> validator.validate("),
    (f"{_PKG}/loaders/HttpLoader.java",
     "try(HttpClient client = HttpClient.newBuilder()\n"
     "                .followRedirects(HttpClient.Redirect.NORMAL)\n"
     "                .build()) {",
     "try {\n"
     "            HttpClient client = HttpClient.newBuilder()\n"
     "                .followRedirects(HttpClient.Redirect.NORMAL)\n"
     "                .build();"),
]

SUITE = HERE / "suite"
_DIALECTS = {"draft7": "draft7", "draft2019": "2019-09", "draft2020": "2020-12"}


def build_reference_probe(root: pathlib.Path):
    """Builds the reference + stub + probe; returns a batch runner.
    Exposed for conftest's session-scoped ``ref`` fixture and
    scripts/sweep_reference.py."""
    src = root / "src"
    shutil.copytree(REFERENCE / "src" / "main" / "java", src)
    for rel, old, new in _PATCHES:
        f = src / rel
        text = f.read_text(encoding="utf-8")
        assert old in text, f"compat patch no longer applies: {rel}: {old!r}"
        f.write_text(text.replace(old, new), encoding="utf-8")
    classes = root / "classes"
    classes.mkdir()
    sources = [str(p) for p in src.rglob("*.java")]
    sources += [str(p) for p in (HERE / "refjava").rglob("*.java")]
    listing = root / "sources.txt"
    listing.write_text("\n".join(sources))
    cp = ":".join(JACKSON)
    subprocess.run(
        [JAVAC, "-encoding", "UTF-8", "-d", str(classes), "-cp", cp,
         f"@{listing}"],
        check=True, capture_output=True)
    run_cp = f"{classes}:{REFERENCE / 'src' / 'main' / 'resources'}:{cp}"

    def run(cases, kinds=False):
        """cases: [(schema_json, instance_json, dialect, fmt_bool)] ->
        verdict chars (t/f/c/e); with kinds=True an 'f' verdict keeps
        its ':KIND1,KIND2' suffix (the reference's EErrorType set)."""
        payload = "\n".join(
            base64.b64encode(c[0].encode()).decode() + "\t"
            + base64.b64encode(c[1].encode()).decode() + "\t"
            + c[2] + "\t" + ("1" if c[3] else "0")
            + ("\t1" if len(c) > 4 and c[4] else "")
            for c in cases)
        r = subprocess.run(
            [JAVA, "-cp", run_cp, "RefProbe"], input=payload + "\n",
            capture_output=True, text=True, check=True)
        out = r.stdout.split()
        assert len(out) == len(cases), r.stderr[-2000:]
        return out if kinds else [v.split(":")[0] for v in out]

    return run


def _ref_pairs(got: str) -> set[tuple[str, str]]:
    """Parse a kinds=True 'f:KIND@b64ptr,...' verdict into a set of
    (EErrorType name, instance JSON pointer) pairs."""
    if len(got) <= 2:
        return set()
    pairs = set()
    for tok in got[2:].split(","):
        kind, _, rest = tok.partition("@")
        b64 = rest.split("@", 1)[0]
        pairs.add((kind, base64.b64decode(b64).decode("utf-8")))
    return pairs


def _ref_triples(got: str) -> set[tuple[str, str, str]]:
    """Parse a kinds=True 'f:KIND@b64ptr@b64msg,...' verdict into
    (EErrorType name, instance pointer, rendered getError() text)."""
    if len(got) <= 2:
        return set()
    triples = set()
    for tok in got[2:].split(","):
        kind, _, rest = tok.partition("@")
        b64_ptr, _, b64_msg = rest.partition("@")
        triples.add((kind,
                     base64.b64decode(b64_ptr).decode("utf-8"),
                     base64.b64decode(b64_msg).decode("utf-8")))
    return triples


# kept for importers that want the builder directly; the shared fixture
# lives in conftest.py (session scope — one javac for all modules)


def _corpus_cases():
    for sub, dialect in _DIALECTS.items():
        for f in sorted((SUITE / sub).glob("*.json")):
            fmt = f.name.startswith("optional_format")
            for g in json.loads(f.read_text()):
                for t in g["tests"]:
                    yield (f"{sub}/{f.stem}", g["description"],
                           t["description"], json.dumps(g["schema"]),
                           json.dumps(t["data"]), dialect, fmt,
                           bool(t["valid"]))


def _needs_network(schema_json: str) -> bool:
    # draft-07 meta-schema refs resolve only via http in the reference
    # (fragment-keyed embedded resolver entry); see module docstring
    return "json-schema.org/draft-07/schema" in schema_json


# Deliberate, verified divergences from the compiled reference — each a
# DEFECT in the reference rather than a semantic choice, so the engine
# does not replicate it (everything else in the corpus is
# reference-verified, including the Jackson-strict equality family):
_REFERENCE_DEFECT_DIVERGENCES = {
    # ContentUtils.checkQuotedPrintable double-increments after '='
    # (ContentUtils.java:146-149: `++i` in the bounds check and again
    # in the read), so the char right after '=' is SKIPPED: canonical
    # "=3D" throws "Not full HEX pair" while "=3DA" decodes to 0xDA,
    # and a soft break only survives as "=\r\n" (the \r rides the
    # skipped slot). The engine implements RFC 2045.
    ("draft7/content", "contentEncoding quoted-printable parity",
     "lowercase hex pair accepted"),
    ("draft7/content", "contentEncoding quoted-printable parity",
     "soft break =LF accepted"),
    # URITemplateVariable.parse("") throws outside the
    # URITemplateSyntaxException catch (URITemplateParser.java:5-13),
    # so format "uri-template" on "{}" ESCAPES as a runtime exception
    # ('e') instead of a verdict; the engine returns invalid.
    ("draft7/optional_format_extra", "uri-template format", "empty expr"),
    # The reference implements NO RFC 5893 bidi rules (no bidi /
    # directionality logic anywhere under src/main) — it accepts RTL
    # labels the RFC forbids. The engine enforces the bidi rule.
    ("draft7/optional_format_extra",
     "idn-hostname format (contextual + bidi rules)",
     "Bidi: EN and AN mixed in one RTL label invalid"),
    ("draft7/optional_format_extra",
     "idn-hostname format (contextual + bidi rules)",
     "Bidi: leading digit in bidi domain invalid"),
}


def test_corpus_verdicts_match_the_reference(ref):
    cases = list(_corpus_cases())
    verdicts = ref([(s, i, d, fmt) for _, _, _, s, i, d, fmt, _ in cases])
    mismatches = []
    net_skipped = 0
    defect_skipped = 0
    for (fid, gdesc, tdesc, s, i, d, fmt, want), got in zip(cases, verdicts):
        if got == "c" and _needs_network(s):
            net_skipped += 1
            continue
        if (fid, gdesc, tdesc) in _REFERENCE_DEFECT_DIVERGENCES:
            defect_skipped += 1
            continue
        want_ch = "t" if want else "f"
        if got != want_ch:
            mismatches.append((fid, gdesc, tdesc, want_ch, got))
    assert not mismatches, (
        f"{len(mismatches)}/{len(cases)} corpus verdicts disagree with the "
        f"REAL reference; first 15: {mismatches[:15]}")
    assert net_skipped < 25  # only the documented meta-schema-ref cases
    assert defect_skipped == len(_REFERENCE_DEFECT_DIVERGENCES)


@pytest.mark.parametrize("draft,seed", [
    ("draft7", 11), ("2019-09", 12), ("2020-12", 13),
    ("draft7", 14), ("2020-12", 15),
])
def test_generated_schemas_agree_kernel_vs_reference(ref, draft, seed):
    from json_schema_spark.core.validator import compile_schema

    rng = random.Random(seed)
    cases = []
    compiled = []
    for _ in range(200):
        sch = gen.schema(rng, draft, top=True)
        docs = [gen.value(rng) for _ in range(8)]
        try:
            kernel = compile_schema(sch, dialect=draft)
        except Exception:
            continue  # generator artifacts the engine rejects: skip
        sj = json.dumps(sch)
        for doc in docs:
            cases.append((sj, json.dumps(doc), draft, False))
            compiled.append((kernel, sch, doc))
    verdicts = ref(cases)
    mismatches = []
    ref_rejects = 0
    for (kernel, sch, doc), got in zip(compiled, verdicts):
        if got == "c":
            ref_rejects += 1
            continue
        mine = "t" if kernel.is_valid(doc) else "f"
        if mine != got:
            mismatches.append((sch, doc, got, mine))
    assert not mismatches, (
        f"{len(mismatches)}/{len(cases)} verdicts disagree with the REAL "
        f"reference; first 10: {mismatches[:10]}")
    # the generator emits only compilable schemas; reference compile
    # errors would mean the fuzz silently stopped comparing
    assert ref_rejects < len(cases) * 0.02

_BAD_VALUES = [None, True, -1, 0.5, "x", [], {}, [1, 1], ["a", "a"],
               {"a": 1}, "   ", 2.0]


@pytest.mark.parametrize("seed", [21, 22])
def test_schema_compile_rejection_agrees(ref, seed):
    """Corrupt one keyword argument per generated schema and compare
    COMPILE accept/reject with the reference (its checkIt guards raise
    at SchemaBuilder.compile; our SchemaCompileError must align)."""
    from json_schema_spark.core.validator import SchemaCompileError, compile_schema

    rng = random.Random(seed)
    cases = []
    for _ in range(300):
        sch = gen.schema(rng, "2020-12", top=True)
        if not isinstance(sch, dict) or not sch:
            continue
        kw = rng.choice(sorted(sch))
        sch = dict(sch)
        sch[kw] = rng.choice(_BAD_VALUES)
        cases.append(sch)
    verdicts = ref([(json.dumps(s), "1", "2020-12", False) for s in cases])
    mismatches = []
    for sch, got in zip(cases, verdicts):
        if got == "e":
            # the reference defers some failures to apply() (e.g. a
            # whitespace $ref URI resolving lazily): rejecting at
            # compile OR validate both count as rejection — skip
            continue
        ref_rejects = got == "c"
        try:
            compile_schema(sch, dialect="2020-12")
            mine_rejects = False
        except SchemaCompileError:
            mine_rejects = True
        except Exception as e:  # never a raw crash
            mismatches.append((sch, got, f"raised {type(e).__name__}"))
            continue
        if mine_rejects != ref_rejects:
            mismatches.append((sch, got, "kernel-rejects" if mine_rejects else "kernel-accepts"))
    assert not mismatches, (
        f"{len(mismatches)}/{len(cases)} compile verdicts disagree with the "
        f"reference; first 10: {mismatches[:10]}")

def test_error_kinds_cover_the_reference(ref):
    """Typed-error-model differential: for every failing corpus case,
    the reference's EErrorType set must be a SUBSET of our violation
    kinds (we additionally emit applicator-context violations —
    ADDITIONAL_PROPERTIES / branch errors under anyOf / DEPENDENCIES
    wrappers — which the reference's flattened tree does not), and the
    two sets must be exactly equal for most cases."""
    from json_schema_spark.core.errors import error_kind_of
    from json_schema_spark.core.validator import CompileConfig, compile_schema

    # documented kind divergence: the reference's AdditionalItemsCompiler
    # absorbs tuple-items results and treats FAILED positions as
    # unevaluated, so a wrong-type positional item surfaces as the
    # additionalItems FALSE_SCHEMA (the TYPE error is swallowed); we
    # report the real positional cause
    kind_divergences = {
        ("draft7/edgecases", "tuple items with additionalItems false",
         "wrong positional type"),
    }
    cases = [c for c in _corpus_cases() if not c[7]]
    verdicts = ref([(s, i, d, fmt) for _, _, _, s, i, d, fmt, _ in cases],
                   kinds=True)
    missing = []
    exact = checked = 0
    for (fid, gdesc, tdesc, s, i, d, fmt, _), got in zip(cases, verdicts):
        if not got.startswith("f:"):
            continue
        if (fid, gdesc, tdesc) in kind_divergences:
            continue
        ref_kinds = {k for k, _ in _ref_pairs(got)}
        try:
            kernel = compile_schema(
                json.loads(s), dialect=d,
                config=CompileConfig(dialect=d, format_assertions=fmt))
            ok, errs = kernel.validate_json(i)
        except Exception:
            continue
        if ok:
            continue  # verdict parity is the other test's job
        mine = {error_kind_of(kw, msg).name for _, kw, msg in (errs or [])}
        checked += 1
        if ref_kinds <= mine:
            exact += ref_kinds == mine
        else:
            missing.append((fid, gdesc, tdesc, sorted(ref_kinds - mine),
                            sorted(mine)))
    assert not missing, (
        f"{len(missing)}/{checked} failing cases MISS a reference error "
        f"kind; first 10: {missing[:10]}")
    assert checked > 250 and exact / checked > 0.8, (checked, exact)

def test_error_pointers_match_the_reference(ref):
    """Instance-pointer differential: for every failing corpus case,
    every (EErrorType, instance JSON pointer) pair the reference emits
    must appear among our violation (kind, path) pairs — i.e. each
    reference error is reported at the SAME place in the instance —
    and the pair sets must be exactly equal for most cases (the engine
    additionally emits applicator-context violations the reference's
    flattened tree does not, so subset is the hard gate)."""
    from json_schema_spark.core.errors import error_kind_of
    from json_schema_spark.core.validator import CompileConfig, compile_schema

    cases = [c for c in _corpus_cases() if not c[7]]
    verdicts = ref([(s, i, d, fmt) for _, _, _, s, i, d, fmt, _ in cases],
                   kinds=True)
    missing = []
    exact = checked = 0
    for (fid, gdesc, tdesc, s, i, d, fmt, _), got in zip(cases, verdicts):
        if not got.startswith("f:"):
            continue
        if (fid, gdesc, tdesc) in _POINTER_DIVERGENCES:
            continue
        ref_pairs = _ref_pairs(got)
        try:
            kernel = compile_schema(
                json.loads(s), dialect=d,
                config=CompileConfig(dialect=d, format_assertions=fmt))
            ok, errs = kernel.validate_json(i)
        except Exception:
            continue
        if ok:
            continue  # verdict parity is the other test's job
        mine = {(error_kind_of(kw, msg).name, path)
                for path, kw, msg in (errs or [])}
        checked += 1
        if ref_pairs <= mine:
            exact += ref_pairs == mine
        else:
            missing.append((fid, gdesc, tdesc, sorted(ref_pairs - mine),
                            sorted(mine)))
    assert not missing, (
        f"{len(missing)}/{checked} failing cases MISS a reference "
        f"(kind, pointer) pair; first 10: {missing[:10]}")
    assert checked > 250 and exact / checked > 0.7, (checked, exact)


# (file id, group desc, test desc) triples where the reference's error
# POINTER is either undefined or a documented defect — populated as the
# differential surfaces them; keep kind divergences in sync with
# test_error_kinds_cover_the_reference.
_POINTER_DIVERGENCES = {
    ("draft7/edgecases", "tuple items with additionalItems false",
     "wrong positional type"),
}


@pytest.mark.parametrize("draft,seed", [
    ("draft7", 201), ("2019-09", 202), ("2020-12", 203),
])
def test_error_pointers_generated_schemas(ref, draft, seed):
    """Instance-pointer differential over GENERATED schemas — the
    corpus alone missed the reference's additionalProperties /
    additionalItems absorb (failed positions are re-validated against
    the additional* schema and those errors surface at the same
    pointers). Subset is the hard gate; extras are ours by design."""
    from json_schema_spark.core.errors import error_kind_of
    from json_schema_spark.core.validator import CompileConfig, compile_schema

    rng = random.Random(f"ptr-{draft}-{seed}")
    cases, kernels = [], []
    for _ in range(250):
        sch = gen.schema(rng, draft, top=True)
        try:
            kernel = compile_schema(sch, config=CompileConfig(dialect=draft))
        except Exception:
            continue
        sj = json.dumps(sch)
        for _ in range(6):
            doc = gen.value(rng)
            cases.append((sj, json.dumps(doc), draft, False))
            kernels.append((kernel, doc))
    verdicts = ref(cases, kinds=True)
    checked = exact = 0
    missing = []
    for (kernel, doc), got in zip(kernels, verdicts):
        if not got.startswith("f:"):
            continue
        ref_pairs = _ref_pairs(got)
        ok, errs = kernel.validate(doc)
        if ok:
            continue  # verdict parity is the other test's job
        mine = {(error_kind_of(kw, msg).name, path)
                for path, kw, msg in (errs or [])}
        checked += 1
        if ref_pairs <= mine:
            exact += ref_pairs == mine
        else:
            missing.append((sorted(ref_pairs - mine), sorted(mine)))
    assert not missing, (
        f"{len(missing)}/{checked} failing generated cases MISS a "
        f"reference (kind, pointer) pair; first 5: {missing[:5]}")
    assert checked > 300 and exact / checked > 0.7, (checked, exact)


@pytest.mark.parametrize("seed", [31])
def test_treat_as_array_agrees_with_reference(ref, seed):
    """setTryCastToArray differential: generated schemas + instances
    through the reference with the experimental mode on, vs the kernel
    with treat_as_array=True."""
    from json_schema_spark.core.validator import CompileConfig, compile_schema

    rng = random.Random(seed)
    cases = []
    kernels = []
    for _ in range(150):
        sch = gen.schema(rng, "2020-12", top=True)
        try:
            kernel = compile_schema(sch, config=CompileConfig(
                dialect="2020-12", treat_as_array=True))
        except Exception:
            continue
        sj = json.dumps(sch)
        for _ in range(6):
            doc = gen.value(rng)
            cases.append((sj, json.dumps(doc), "2020-12", False, True))
            kernels.append((kernel, sch, doc))
    verdicts = ref(cases)
    mismatches = []
    for (kernel, sch, doc), got in zip(kernels, verdicts):
        if got not in ("t", "f"):
            continue
        mine = "t" if kernel.is_valid(doc) else "f"
        if mine != got:
            mismatches.append((sch, doc, got, mine))
    assert not mismatches, (
        f"{len(mismatches)}/{len(cases)} treat-as-array verdicts disagree; "
        f"first 10: {mismatches[:10]}")


_TREE_DOCS = [
    {"data": 1, "children": [{"data": 2, "children": []}]},
    {"data": 1, "children": [{"data": "bad", "children": []}]},
    {"data": "bad"},
    {"children": [{"children": [{"data": 3.5}]}]},
    {"children": ["notanode"]},
]


def _tree_resource(draft: str) -> dict:
    if draft == "2019-09":
        anchor, inner = {"$recursiveAnchor": True}, {"$recursiveRef": "#"}
    else:
        anchor, inner = {"$dynamicAnchor": "node"}, {"$dynamicRef": "#node"}
    return {"$id": "http://fuzz.test/tree.json", **anchor, "type": "object",
            "properties": {"children": {"type": "array", "items": inner}}}


def test_dynamic_scope_cross_resource(ref):
    """Dynamic/recursive refs across an embedded-resource boundary:
    the outermost dynamic scope wins when the root re-declares the
    anchor ("strict"); without it the ref stays in the inner resource
    ("loose"); a plain $anchor at the initial target does not arm a
    $dynamicRef (bookending). 23 handcrafted cases, verdict-compared
    against the compiled reference."""
    from json_schema_spark.core.validator import compile_schema

    ext = {"$defs": None, "$ref": "http://fuzz.test/tree.json",
           "$id": "http://fuzz.test/root.json",
           "properties": {"data": {"type": "integer"}, "children": True}}

    def extend(draft: str, redeclare: bool) -> dict:
        s = dict(ext)
        s["$defs"] = {"tree": _tree_resource(draft)}
        if redeclare:
            s.update({"$recursiveAnchor": True} if draft == "2019-09"
                     else {"$dynamicAnchor": "node"})
        return s

    book = {"$id": "http://fuzz.test/root.json", "$dynamicAnchor": "node",
            "type": "object", "$ref": "http://fuzz.test/leaf.json",
            "$defs": {"leaf": {"$id": "http://fuzz.test/leaf.json",
                               "properties": {"x": {"$dynamicRef": "#node"}},
                               "$defs": {"n": {"$anchor": "node",
                                               "type": "string"}}}}}
    plans = [
        ("2020-12", extend("2020-12", True), _TREE_DOCS),
        ("2020-12", extend("2020-12", False), _TREE_DOCS),
        ("2019-09", extend("2019-09", True), _TREE_DOCS),
        ("2019-09", extend("2019-09", False), _TREE_DOCS),
        ("2020-12", book, [{"x": "s"}, {"x": 5}, {"x": {}}]),
    ]
    cases, kernels = [], []
    for draft, sch, docs in plans:
        kernel = compile_schema(sch, dialect=draft)
        for doc in docs:
            cases.append((json.dumps(sch), json.dumps(doc), draft, False))
            kernels.append((kernel, sch, doc))
    verdicts = ref(cases)
    mismatches = []
    for (kernel, sch, doc), got in zip(kernels, verdicts):
        mine = "t" if kernel.is_valid(doc) else "f"
        if mine != got:
            mismatches.append((sch, doc, got, mine))
    assert not mismatches, f"first: {mismatches[:5]}"


@pytest.mark.parametrize("draft,seed", [
    ("draft7", 41), ("2019-09", 42), ("2020-12", 43),
])
def test_targeted_instances_agree_with_reference(ref, draft, seed):
    """Schema-AWARE instances (synthesized toward validity, then
    mutated into near-misses) — exercises the t/f boundary DEEP inside
    schemas whose interior blind fuzz never reaches (~20% of generated
    schemas; targeted synthesis enters ~half of those)."""
    from json_schema_spark.core.validator import compile_schema

    rng = random.Random(f"targeted-{draft}-{seed}")
    cases, compiled = [], []
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
            compiled.append((kernel, sch, doc))
    verdicts = ref(cases)
    mismatches = []
    valid = 0
    for (kernel, sch, doc), got in zip(compiled, verdicts):
        if got == "c":
            continue
        valid += got == "t"
        mine = "t" if kernel.is_valid(doc) else "f"
        if mine != got:
            mismatches.append((sch, doc, got, mine))
    assert not mismatches, (
        f"{len(mismatches)}/{len(cases)} targeted-instance verdicts disagree "
        f"with the REAL reference; first 10: {mismatches[:10]}")
    assert valid > len(cases) * 0.3  # the bias actually biases


@pytest.mark.parametrize("draft,seed", [
    ("draft7", 211), ("2019-09", 212), ("2020-12", 213),
])
def test_error_pointers_targeted_instances(ref, draft, seed):
    """(kind, instance-pointer) differential on NEAR-MISS mutants of
    schema-aware instances: these fail deep with few errors — the
    hardest pointer-parity surface (a blind doc usually fails at ''
    with a root type error). Subset gate like the blind variant."""
    from json_schema_spark.core.errors import error_kind_of
    from json_schema_spark.core.validator import CompileConfig, compile_schema

    rng = random.Random(f"tptr-{draft}-{seed}")
    cases, kernels = [], []
    for _ in range(250):
        sch = gen.schema(rng, draft, top=True)
        try:
            kernel = compile_schema(sch, config=CompileConfig(dialect=draft))
        except Exception:
            continue
        sj = json.dumps(sch)
        for _ in range(3):
            doc = gen.mutate(rng, gen.targeted_value(rng, sch),
                             n_edits=1 + (rng.random() < 0.3))
            cases.append((sj, json.dumps(doc), draft, False))
            kernels.append((kernel, doc))
    verdicts = ref(cases, kinds=True)
    checked = exact = 0
    missing = []
    for (kernel, doc), got in zip(kernels, verdicts):
        if not got.startswith("f:"):
            continue
        ref_pairs = _ref_pairs(got)
        ok, errs = kernel.validate(doc)
        if ok:
            continue
        mine = {(error_kind_of(kw, msg).name, path)
                for path, kw, msg in (errs or [])}
        checked += 1
        if ref_pairs <= mine:
            exact += ref_pairs == mine
        else:
            missing.append((sorted(ref_pairs - mine), sorted(mine)))
    assert not missing, (
        f"{len(missing)}/{checked} failing targeted cases MISS a "
        f"reference (kind, pointer) pair; first 5: {missing[:5]}")
    # deep failures carry our by-design roll-up extras (parent-pointer
    # ADDITIONAL_PROPERTIES / PROPERTY_NAMES / IF_THEN_ELSE /
    # unevaluated* wrappers around the leaf error the reference reports
    # alone) much more often than shallow ones — measured 0.65-0.70
    # exact vs 0.7+ on blind docs; the subset gate above is the parity
    # statement, the ratio just pins the roll-up rate from drifting
    assert checked > 150 and exact / checked > 0.6, (checked, exact)


def test_nonstring_id_compile_locus(ref):
    """Non-string ``$id``: post-draft-7 it is a compile error on any
    COMPILED (reachable) node — IdCompiler.resolveCompilationOrder
    reads textValue() unconditionally — but legal inside never-compiled
    $defs; draft-7 errors even unreached (preprocessor walk). 11-case
    battery, verdict-compared against the compiled reference."""
    from json_schema_spark.core.validator import compile_schema

    cases = [
        ({"$id": [1, 2], "type": "integer"}, "2020-12"),
        ({"properties": {"a": {"$id": 5, "type": "integer"}}}, "2020-12"),
        ({"$defs": {"dead": {"$id": 5, "type": "integer"}},
          "type": "integer"}, "2020-12"),
        ({"$id": [1, 2], "type": "integer"}, "2019-09"),
        ({"$id": [1, 2], "type": "integer"}, "draft7"),
        ({"properties": {"a": {"$id": 5, "type": "integer"}}}, "draft7"),
        ({"definitions": {"dead": {"$id": 5, "type": "integer"}},
          "type": "integer"}, "draft7"),
        ({"$id": True, "type": "integer"}, "2020-12"),
        ({"$id": 7, "type": "integer"}, "2020-12"),
        ({"$id": 5, "$ref": "#/definitions/d",
          "definitions": {"d": {"type": "integer"}}}, "draft7"),
        ({"$id": 5, "$ref": "#/$defs/d",
          "$defs": {"d": {"type": "integer"}}}, "2020-12"),
    ]
    batch = [(json.dumps(s), "3", d, False) for s, d in cases]
    batch += [(json.dumps(s), "\"x\"", d, False) for s, d in cases]
    got = ref(batch)
    n = len(cases)
    bad = []
    for i, (s, d) in enumerate(cases):
        try:
            k = compile_schema(s, dialect=d)
            mine = ("t" if k.is_valid(3) else "f") \
                + ("t" if k.is_valid("x") else "f")
        except Exception:
            mine = "cc"
        if mine != got[i] + got[n + i]:
            bad.append((s, d, got[i] + got[n + i], mine))
    assert not bad, bad


def test_uri_grammar_battery(ref):
    """java.net.URI grammar enforcement loci (reference-probe pinned):
    registered resource $ids are URI.create-validated in EVERY position
    (reached or not, every dialect; only draft-7 $ref-suppressed ids
    escape); ref PATH parts are validated when non-blank; ref FRAGMENTS
    are never URI-validated — they go through URLDecoder (form decode:
    '+' → space, %XX strict) before pointer/anchor lookup; a second '#'
    truncates; '[' ']' are legal only in the authority."""
    from json_schema_spark.core.validator import compile_schema

    def idcase(idv, draft="2020-12", reached=True):
        c = "definitions" if draft == "draft7" else "$defs"
        if reached:
            return ({"$id": idv, "type": "integer"}, draft)
        return ({c: {"dead": {"$id": idv, "type": "integer"}},
                 "type": "integer"}, draft)

    cases = [
        idcase("   "), idcase("   ", reached=False),
        idcase("   ", "draft7"), idcase("   ", "draft7", reached=False),
        idcase("http://x/%zz"), idcase("http://x/a b"),
        idcase("http://x/héllo"), idcase(""), idcase("1http://x/"),
        idcase("http://x/a\tb"), idcase("http://x/{a}"),
        idcase("http:\\\\x"), idcase("http://x/a[1]"),
        idcase("http://[::1]/a"),
        ({"$defs": {"d": {"type": "integer"}}, "$ref": "#/$defs/d "},
         "2020-12"),
        ({"$defs": {"d": {"type": "integer"}},
          "allOf": [{"$ref": "#%zz"}]}, "2020-12"),
        ({"$defs": {"d": {"$anchor": "a b", "type": "integer"}},
          "$ref": "#a%20b"}, "2020-12"),
        ({"$defs": {"d": {"$anchor": "a b", "type": "integer"}},
          "$ref": "#a+b"}, "2020-12"),
        ({"$id": "   ", "$ref": "#/definitions/d",
          "definitions": {"d": {"type": "integer"}}}, "draft7"),
        ({"definitions": {"d": {"$id": "#a b", "type": "integer"}},
          "$ref": "#a b"}, "draft7"),
        ({"definitions": {"d": {"$id": "#a b", "type": "integer"}},
          "$ref": "#a%20b"}, "draft7"),
        ({"$defs": {"a b": {"type": "integer"}},
          "$ref": "#/$defs/a%20b"}, "2020-12"),
        ({"$defs": {"a/b": {"type": "integer"}},
          "$ref": "#/$defs/a~1b"}, "2020-12"),
        ({"$defs": {"d": {"$anchor": "a", "type": "integer"}},
          "$ref": "#a#b"}, "2020-12"),
    ]
    batch = [(json.dumps(s), "3", d, False) for s, d in cases]
    batch += [(json.dumps(s), "\"x\"", d, False) for s, d in cases]
    got = ref(batch)
    n = len(cases)
    bad = []
    for i, (s, d) in enumerate(cases):
        try:
            k = compile_schema(s, dialect=d)
            mine = ("t" if k.is_valid(3) else "f") \
                + ("t" if k.is_valid("x") else "f")
        except Exception:
            mine = "cc"
        if mine != got[i] + got[n + i]:
            bad.append((s, d, got[i] + got[n + i], mine))
    assert not bad, bad


def test_nested_schema_keyword_is_inert(ref):
    """$schema is honored ONLY at a loaded document's root
    (registerSchema → DialectResolver.resolveDialect on the document
    node, SchemasRegistry.java:77-79): a nested $schema — even beside
    $id on an embedded resource — never switches keyword activity
    (reference-probe pinned: cross-dialect prefixItems / tuple-items
    stay governed by the document dialect)."""
    from json_schema_spark.core.validator import compile_schema

    d7 = "http://json-schema.org/draft-07/schema#"
    d2020 = "https://json-schema.org/draft/2020-12/schema"
    cases = [
        ({"properties": {"a": {"$schema": d2020,
          "prefixItems": [{"type": "integer"}, {"type": "integer"}]}}},
         "draft7"),
        ({"properties": {"a": {"$schema": d7,
          "items": [{"type": "integer"}, {"type": "integer"}]}}},
         "2020-12"),
        ({"$id": "http://fuzz.test/r",
          "properties": {"a": {"$id": "http://fuzz.test/sub",
          "$schema": d7,
          "items": [{"type": "integer"}, {"type": "integer"}]}}},
         "2020-12"),
        ({"$id": "http://fuzz.test/r",
          "properties": {"a": {"$id": "http://fuzz.test/sub",
          "$schema": d2020, "prefixItems": [{"type": "integer"}]}}},
         "draft7"),
    ]
    docs = [{"a": [5, "x"]}, {"a": ["x"]}, {"a": [1, 2]}]
    batch = [(json.dumps(s), json.dumps(doc), d, False)
             for s, d in cases for doc in docs]
    got = ref(batch)
    bad = []
    i = 0
    for s, d in cases:
        kernel = compile_schema(s, dialect=d)
        mine = "".join("t" if kernel.is_valid(doc) else "f" for doc in docs)
        refv = "".join(got[i:i + 3])
        i += 3
        if mine != refv:
            bad.append((s, d, refv, mine))
    assert not bad, bad
