"""Deterministic random JSON-Schema + instance generator for the
cross-implementation differential suite (kernel vs the independent
``jsonschema`` library).

The value pools are shared between schema and instance generation so
random instances actually collide with enum/const/properties/pattern
constraints instead of trivially missing them.

Deliberately NOT generated (documented engine-vs-library divergences,
both sides of which are spec-defensible — our side follows the
reference implementation):

* ``format`` — assertion is off by default in both, but keep it out of
  the comparison entirely;
* ``contentEncoding``/``contentMediaType``/``contentSchema`` — the
  reference asserts them by default in draft-7
  (``ContentTypesCompilerFactory.java:56-64``); the ``jsonschema``
  library never asserts them;
* non-integer ``multipleOf`` — the reference (and this engine) use
  exact decimal arithmetic (``MultipleOfCompiler.java:36-43``), the
  library uses binary floats (0.07 is an exact multiple of 0.01 in
  decimal, not in float).
"""

from __future__ import annotations

import json
import random
from typing import Any

KEYS = ["a", "b", "c", "k"]
# non-ASCII strings catch Unicode-class divergences between the Java
# rlike path (needs the (?U) flag) and Python re (Unicode by default) —
# Arabic-Indic digits, accented letters, combining marks, CJK
# "b\n" exercises $-anchoring on terminator-tailed strings (Python's $
# and Java's $ agree on a single \n tail, so the library comparison
# stays sound; \r\n tails — where they differ — live in the
# javaregex_dialect corpus, which the library gate skips)
STRS = ["", "x", "ab", "abc", "hello world", "Zz9", "aXa",
        "٣٤", "Ünïcode", "é", "数字12", "۴۵x", "b\n"]
NUMS = [0, 1, -1, 2, 3, 5, 10, 100, 1.0, 2.5, -0.5,
        # number-model discriminators (double-first float parsing,
        # exact big integers, -0, shortest-roundtrip decimals)
        -0.0, 0.30000000000000004, 1e15, 10**20, 2**63 - 1]
PATTERNS = ["^a", "b$", "[0-9]+", "^[a-z]{2,4}$", "c", "^Z",
            "^\\d+$", "\\w", "^\\d"]
SCALARS: list[Any] = [None, True, False, *NUMS, *STRS]
TYPES = ["null", "boolean", "integer", "number", "string", "array", "object"]


def value(rng: random.Random, depth: int = 2) -> Any:
    r = rng.random()
    if depth == 0 or r < 0.5:
        return rng.choice(SCALARS)
    if r < 0.78:
        return [value(rng, depth - 1) for _ in range(rng.randrange(0, 4))]
    return {k: value(rng, depth - 1)
            for k in rng.sample(KEYS, rng.randrange(0, len(KEYS)))}


def _scalar_schema(rng: random.Random) -> dict:
    s: dict = {}
    if rng.random() < 0.6:
        t = rng.sample(TYPES, rng.choice([1, 1, 1, 2]))
        s["type"] = t[0] if len(t) == 1 else t
    picks = rng.sample(
        ["enum", "const", "bounds", "multipleOf", "pattern", "length"],
        rng.randrange(0, 3),
    )
    if "enum" in picks:
        s["enum"] = rng.sample(SCALARS, rng.randrange(1, 4))
    if "const" in picks:
        s["const"] = rng.choice(SCALARS)
    if "bounds" in picks:
        lo, hi = sorted(rng.sample(NUMS, 2))
        s[rng.choice(["minimum", "exclusiveMinimum"])] = lo
        s[rng.choice(["maximum", "exclusiveMaximum"])] = hi
    if "multipleOf" in picks:
        s["multipleOf"] = rng.choice([1, 2, 3, 5])
    if "pattern" in picks:
        s["pattern"] = rng.choice(PATTERNS)
    if "length" in picks:
        s["minLength"] = rng.randrange(0, 3)
        s["maxLength"] = rng.randrange(3, 9)
    return s


def _object_schema(rng: random.Random, draft: str, depth: int) -> dict:
    s: dict = {}
    props = rng.sample(KEYS, rng.randrange(1, 4))
    s["properties"] = {k: schema(rng, draft, depth - 1) for k in props}
    if rng.random() < 0.5:
        s["required"] = rng.sample(props, rng.randrange(0, len(props) + 1))
    r = rng.random()
    if r < 0.25:
        s["additionalProperties"] = rng.choice([True, False])
    elif r < 0.4:
        s["additionalProperties"] = schema(rng, draft, depth - 1)
    if rng.random() < 0.25:
        s["patternProperties"] = {rng.choice(PATTERNS): schema(rng, draft, depth - 1)}
    if rng.random() < 0.2:
        s["minProperties"] = rng.randrange(0, 3)
    if rng.random() < 0.15:
        s["maxProperties"] = rng.randrange(1, 5)
    if rng.random() < 0.2:
        dep_on, dep_need = rng.choice(KEYS), [rng.choice(KEYS)]
        if draft == "draft7":
            s["dependencies"] = {dep_on: dep_need}
        else:
            s["dependentRequired"] = {dep_on: dep_need}
    if rng.random() < 0.12:
        # schema-form dependency (draft7 dual-form / dependentSchemas)
        dep_on = rng.choice(KEYS)
        dep_schema = {"required": [rng.choice(KEYS)]}
        if draft == "draft7":
            deps = s.setdefault("dependencies", {})
            if dep_on not in deps:
                deps[dep_on] = dep_schema
        else:
            s["dependentSchemas"] = {dep_on: dep_schema}
    if rng.random() < 0.15:
        s["propertyNames"] = {"pattern": rng.choice(PATTERNS)}
    return s


def _array_schema(rng: random.Random, draft: str, depth: int) -> dict:
    s: dict = {}
    r = rng.random()
    if draft == "2020-12":
        if r < 0.4:
            s["prefixItems"] = [schema(rng, draft, depth - 1)
                                for _ in range(rng.randrange(1, 3))]
        if rng.random() < 0.6:
            s["items"] = schema(rng, draft, depth - 1)
    else:
        if r < 0.4:
            s["items"] = [schema(rng, draft, depth - 1)
                          for _ in range(rng.randrange(1, 3))]
            if rng.random() < 0.5:
                s["additionalItems"] = schema(rng, draft, depth - 1)
        elif r < 0.8:
            s["items"] = schema(rng, draft, depth - 1)
    if rng.random() < 0.3:
        s["contains"] = schema(rng, draft, depth - 1)
        if draft != "draft7" and rng.random() < 0.5:
            s["minContains"] = rng.randrange(0, 3)
            s["maxContains"] = rng.randrange(2, 5)
    if rng.random() < 0.3:
        s["minItems"] = rng.randrange(0, 3)
    if rng.random() < 0.2:
        s["maxItems"] = rng.randrange(2, 6)
    if rng.random() < 0.25:
        s["uniqueItems"] = True
    return s


def _dict_sub(rng: random.Random, draft: str, depth: int) -> dict:
    """A subschema guaranteed to be a dict (identity keywords like
    ``$anchor``/``$id`` can only be injected into object schemas)."""
    s = schema(rng, draft, depth)
    return s if isinstance(s, dict) else _scalar_schema(rng)


def _anchor_ref_schema(rng: random.Random, draft: str, depth: int) -> dict:
    """Plain-name-fragment ``$ref`` resolution: post-draft-7 ``$anchor``,
    draft-7 ``$id: "#name"`` (reference ``IdKeyword``/anchor registry;
    engine: core/registry.py anchor map)."""
    target = _dict_sub(rng, draft, depth - 1)
    if draft == "draft7":
        target = {**target, "$id": "#a0"}
        return {"definitions": {"d0": target}, "$ref": "#a0"}
    target = {**target, "$anchor": "a0"}
    return {"$defs": {"d0": target}, "$ref": "#a0"}


def _refchain_schema(rng: random.Random, draft: str, depth: int) -> dict:
    """``$ref`` → ``$ref`` chains: the root refs d0, d0 refs d1. Post-
    draft-7, the middle link sometimes carries sibling keywords (both
    the ref target AND the siblings apply); draft-7 siblings on a $ref
    are ignored by spec, which the per-dialect keyword activity already
    pins — here the chain itself is the subject."""
    container = "definitions" if draft == "draft7" else "$defs"
    target = _dict_sub(rng, draft, depth - 1)
    chain: dict = {"$ref": f"#/{container}/d1"}
    if draft != "draft7" and rng.random() < 0.4:
        chain.update(_scalar_schema(rng))
    return {container: {"d0": chain, "d1": target},
            "$ref": f"#/{container}/d0"}


def _nested_id_schema(rng: random.Random, draft: str, depth: int) -> dict:
    """Nested ``$id`` re-bases the embedded resource: a relative
    ``$ref`` from the root resolves against the root base URI into the
    embedded resource, whose fragment pointer is then evaluated in the
    embedded resource's own scope (reference: IdKeyword base-URI
    remapping + registry resolution; engine: core/registry.py embedded-
    resource map). Half the time the ref uses the absolute form."""
    container = "definitions" if draft == "draft7" else "$defs"
    inner = _dict_sub(rng, draft, depth - 1)
    sub = {"$id": "sub/x.json", container: {"inner": inner}}
    ref = (f"sub/x.json#/{container}/inner"
           if rng.random() < 0.5
           else f"http://fuzz.test/sub/x.json#/{container}/inner")
    root: dict = {"$id": "http://fuzz.test/root.json", container: {"sub": sub}}
    if draft == "draft7" or rng.random() < 0.5:
        # draft-7 suppresses a root $id beside $ref (preprocessor
        # isValidIdInEarlyVersions), making the whole schema a compile
        # error in BOTH engines — wrap in allOf so resolution is
        # actually exercised; post-draft-7 exercises both placements
        root["allOf"] = [{"$ref": ref}]
    else:
        root["$ref"] = ref
    return root


def _dynamic_tree_schema(rng: random.Random, draft: str, depth: int) -> dict:
    """Dynamic scope across an embedded-resource boundary (post-draft-7
    only): an embedded ``$id`` resource declares a dynamic/recursive
    anchor and self-refs through it; the root extends the resource via
    absolute ``$ref`` and 60% of the time re-declares the anchor — the
    OUTERMOST dynamic scope must win (reference: DynamicRefCompiler /
    RecursiveRefCompiler scope walk; engine: validator.py resolve_dynamic
    over the evaluation scope chain)."""
    body = _dict_sub(rng, draft, depth - 1)
    key = rng.choice(KEYS)
    if draft == "2019-09":
        inner_ref: dict = {"$recursiveRef": "#"}
        anchor_k, anchor_v = "$recursiveAnchor", True
    else:
        inner_ref = {"$dynamicRef": "#node"}
        anchor_k, anchor_v = "$dynamicAnchor", "node"
    tree = {"$id": "http://fuzz.test/tree.json", anchor_k: anchor_v,
            "properties": {key: inner_ref}}
    root: dict = {"$id": "http://fuzz.test/root.json",
                  "$ref": "http://fuzz.test/tree.json",
                  "$defs": {"tree": tree}}
    if rng.random() < 0.6:
        root[anchor_k] = anchor_v
    for k, v in body.items():
        root.setdefault(k, v)
    return root


def _recursive_schema(rng: random.Random, draft: str, depth: int) -> dict:
    """Self-referential root: draft-7 ``$ref: "#"``, 2019-09
    ``$recursiveRef``/``$recursiveAnchor``, 2020-12
    ``$dynamicRef``/``$dynamicAnchor``. Terminates because instances
    from ``value()`` have bounded depth. The recursion enters through a
    property or items subschema so scalar instances pass trivially and
    nested ones actually re-enter the root scope."""
    if draft == "draft7":
        inner: dict = {"$ref": "#"}
    elif draft == "2019-09":
        inner = {"$recursiveRef": "#"}
    else:
        inner = {"$dynamicRef": "#node"}
    body = _scalar_schema(rng)
    body.pop("const", None)  # a root const would defeat the recursion
    body.pop("enum", None)
    if rng.random() < 0.5:
        s = {"properties": {rng.choice(KEYS): inner}, **body}
    else:
        s = {"items": inner, **body}
    if draft == "2019-09":
        s["$recursiveAnchor"] = True
    elif draft == "2020-12":
        s["$dynamicAnchor"] = "node"
    return s


def schema(rng: random.Random, draft: str, depth: int = 3, top: bool = False) -> Any:
    """One random schema; ``draft`` in {draft7, 2019-09, 2020-12}.

    ``top`` marks the document root: the reference/identity constructs
    ($ref-into-definitions, $anchor/#name refs, recursive roots) are
    only emitted there (fragment pointers resolve against the resource
    root, so a nested copy would dangle — both implementations reject
    it; a nested $recursiveAnchor would change resolution scope)."""
    if depth <= 0:
        return rng.choice([True, False, _scalar_schema(rng)])
    r = rng.random()
    if r < 0.30:
        return _scalar_schema(rng)
    if r < 0.48:
        return _object_schema(rng, draft, depth)
    if r < 0.62:
        return _array_schema(rng, draft, depth)
    if r < 0.74:  # combinators
        kw = rng.choice(["allOf", "anyOf", "oneOf", "not"])
        if kw == "not":
            return {"not": schema(rng, draft, depth - 1)}
        return {kw: [schema(rng, draft, depth - 1)
                     for _ in range(rng.randrange(2, 4))]}
    if r < 0.82:  # conditionals
        s = {"if": schema(rng, draft, depth - 1)}
        if rng.random() < 0.8:
            s["then"] = schema(rng, draft, depth - 1)
        if rng.random() < 0.6:
            s["else"] = schema(rng, draft, depth - 1)
        return s
    if r < 0.92 and top:  # reference / identity constructs
        rr = rng.random()
        if rr < 0.35:  # $ref into the root definitions container
            container = "definitions" if draft == "draft7" else "$defs"
            s = {
                container: {"d0": schema(rng, draft, depth - 1)},
                "$ref": f"#/{container}/d0",
            }
            if draft != "draft7" and rng.random() < 0.5:
                # post-draft-7: $ref siblings apply
                s.update(_scalar_schema(rng))
            return s
        if rr < 0.5:
            return _anchor_ref_schema(rng, draft, depth)
        if rr < 0.62:
            return _recursive_schema(rng, draft, depth)
        if rr < 0.74:
            return _refchain_schema(rng, draft, depth)
        if rr < 0.87 or draft == "draft7":
            return _nested_id_schema(rng, draft, depth)
        return _dynamic_tree_schema(rng, draft, depth)
    if r >= 0.92 and draft != "draft7":  # unevaluated* interaction
        rr = rng.random()
        if rr < 0.4:
            return {
                "allOf": [_object_schema(rng, draft, depth - 1)],
                "unevaluatedProperties":
                    rng.choice([False, schema(rng, draft, depth - 1)]),
            }
        if rr < 0.7:
            return {
                "allOf": [_array_schema(rng, draft, depth - 1)],
                "unevaluatedItems":
                    rng.choice([False, schema(rng, draft, depth - 1)]),
            }
        # absorb-and-skip discriminators: an in-place applicator that can
        # FAIL on wrong-typed instances, absorbed by a sibling
        # unevaluated* (the reference skips it for non-array/non-object
        # instances — see kernel _absorb_group; the jsonschema library
        # follows the spec and always applies it, so the library
        # differential filters these shapes out)
        kw = rng.choice(["unevaluatedProperties", "unevaluatedItems"])
        inplace = rng.choice([
            lambda: {"not": schema(rng, draft, depth - 1)},
            lambda: {"allOf": [_scalar_schema(rng)]},
            lambda: {"if": _scalar_schema(rng),
                     "then": _scalar_schema(rng)},
        ])()
        return {**inplace, kw: rng.choice([False, True, _scalar_schema(rng)])}
    return _object_schema(rng, draft, depth)


# --------------------------------------------------------------------------
# Schema-aware instance synthesis: bias docs toward VALIDITY so deep
# keyword interactions (nested objects, contains, unevaluated*, dynamic
# refs) get exercised at their t/f boundary instead of failing at the
# first shallow type check. Best-effort only — neither engine consumes
# these as ground truth; they are verdict-compared against each other.
# --------------------------------------------------------------------------

# canned witnesses for the PATTERNS pool (search semantics)
_PATTERN_WITNESS = {"^a": "ab", "b$": "ab", "[0-9]+": "x9x", "^[a-z]{2,4}$": "abc",
                    "c": "abc", "^Z": "Zz9", "^\\d+$": "34", "\\w": "ab",
                    "^\\d": "9x"}


def _resolve_for_synth(node: Any, root: Any) -> Any:
    """Crude resolver for the ref shapes THIS generator emits."""
    if not isinstance(node, dict):
        return node
    ref = node.get("$ref") or node.get("$recursiveRef") \
        or node.get("$dynamicRef")
    if not isinstance(ref, str):
        return node
    if ref in ("#", "#node"):
        return root
    frag = ref.partition("#")[2]
    if frag and not frag.startswith("/"):
        # plain-name anchor: find the declaring node
        stack = [root]
        while stack:
            n = stack.pop()
            if isinstance(n, dict):
                if n.get("$anchor") == frag or n.get("$id") == f"#{frag}":
                    return n
                stack.extend(n.values())
            elif isinstance(n, list):
                stack.extend(n)
        return node
    # pointer walk; for uri-qualified refs, locate the embedded resource
    base = root
    uri = ref.partition("#")[0]
    if uri:
        tail = uri.rsplit("/", 1)[-1]
        stack = [root]
        base = None
        while stack:
            n = stack.pop()
            if isinstance(n, dict):
                nid = n.get("$id", "")
                if isinstance(nid, str) and nid.rsplit("/", 1)[-1] == tail:
                    base = n
                    break
                stack.extend(n.values())
            elif isinstance(n, list):
                stack.extend(n)
        if base is None:
            return node
    for part in [p for p in frag.split("/") if p]:
        part = part.replace("~1", "/").replace("~0", "~")
        if isinstance(base, dict) and part in base:
            base = base[part]
        else:
            return node
    return base


def targeted_value(rng: random.Random, sch: Any, root: Any = None,
                   budget: int = 24) -> Any:
    """Synthesize an instance biased toward satisfying ``sch``."""
    if root is None:
        root = sch
    if budget <= 0 or isinstance(sch, bool) or not isinstance(sch, dict):
        return rng.choice(SCALARS)
    resolved = _resolve_for_synth(sch, root)
    if resolved is not sch:
        merged = dict(resolved) if isinstance(resolved, dict) else {}
        if isinstance(resolved, dict):
            for k, v in sch.items():
                if k not in ("$ref", "$recursiveRef", "$dynamicRef"):
                    merged.setdefault(k, v)
            return targeted_value(rng, merged, root, budget - 4)
        return targeted_value(rng, resolved, root, budget - 4)
    if "const" in sch:
        return sch["const"]
    if isinstance(sch.get("enum"), list) and sch["enum"]:
        return rng.choice(sch["enum"])
    for comb in ("allOf", "anyOf", "oneOf"):
        branches = sch.get(comb)
        if isinstance(branches, list) and branches:
            pick = branches[0] if comb == "allOf" else rng.choice(branches)
            if isinstance(pick, dict):
                merged = dict(pick)
                for k, v in sch.items():
                    if k != comb:
                        merged.setdefault(k, v)
                return targeted_value(rng, merged, root, budget - 2)
    if "then" in sch or "if" in sch:
        pick = sch.get("then") if "then" in sch else sch.get("if")
        if isinstance(pick, dict):
            merged = dict(pick)
            for k, v in sch.items():
                if k not in ("if", "then", "else"):
                    merged.setdefault(k, v)
            return targeted_value(rng, merged, root, budget - 2)
    t = sch.get("type")
    if isinstance(t, list) and t:
        t = rng.choice(t)
    if t is None:
        # infer from present keywords, else random scalar
        if any(k in sch for k in ("properties", "required", "minProperties",
                                  "maxProperties", "patternProperties")):
            t = "object"
        elif any(k in sch for k in ("items", "prefixItems", "contains",
                                    "minItems", "maxItems", "uniqueItems")):
            t = "array"
        elif any(k in sch for k in ("minLength", "maxLength", "pattern")):
            t = "string"
        elif any(k in sch for k in ("minimum", "maximum", "multipleOf",
                                    "exclusiveMinimum", "exclusiveMaximum")):
            t = "number"
        else:
            return value(rng)
    if t == "null":
        return None
    if t == "boolean":
        return rng.choice([True, False])
    if t in ("integer", "number"):
        lo = sch.get("minimum", sch.get("exclusiveMinimum", 0))
        hi = sch.get("maximum", sch.get("exclusiveMaximum", lo + 10))
        try:
            lo, hi = float(lo), float(hi)
        except (TypeError, ValueError):
            lo, hi = 0.0, 10.0
        if "exclusiveMinimum" in sch:
            lo += 1
        if "exclusiveMaximum" in sch:
            hi -= 1
        m = sch.get("multipleOf")
        if isinstance(m, (int, float)) and m:
            k = int(lo // m) + 1
            cand = k * m
            if cand > hi:
                cand = lo
            return int(cand) if t == "integer" and cand == int(cand) else cand
        mid = (lo + hi) / 2
        if t == "integer":
            return int(mid)
        return mid if rng.random() < 0.5 else int(mid)
    if t == "string":
        pat = sch.get("pattern")
        base = _PATTERN_WITNESS.get(pat, rng.choice(STRS)) if pat \
            else rng.choice(STRS)
        lo = sch.get("minLength", 0)
        hi = sch.get("maxLength")
        if isinstance(lo, int) and len(base) < lo:
            base = base + "a" * (lo - len(base))
        if isinstance(hi, int) and len(base) > hi:
            base = base[:hi]
        return base
    if t == "array":
        items = sch.get("items")
        prefix = sch.get("prefixItems")
        lo = sch.get("minItems", 0 if rng.random() < 0.5 else 1)
        hi = sch.get("maxItems", (lo if isinstance(lo, int) else 0) + 2)
        out = []
        if isinstance(prefix, list):
            out.extend(targeted_value(rng, p, root, budget - 1)
                       for p in prefix)
        elif isinstance(items, list):  # draft-7/2019 tuple form
            out.extend(targeted_value(rng, p, root, budget - 1)
                       for p in items)
        n = max(int(lo) if isinstance(lo, int) else 0, len(out))
        n = min(max(n, len(out)), int(hi) if isinstance(hi, int) else n + 2)
        fill = items if isinstance(items, (dict, bool)) else \
            sch.get("additionalItems", True)
        while len(out) < n:
            out.append(targeted_value(rng, fill, root, budget - 1))
        if "contains" in sch and (not isinstance(sch.get("minContains"), int)
                                  or sch["minContains"] > 0):
            out.append(targeted_value(rng, sch["contains"], root, budget - 1))
        return out
    # object
    props = sch.get("properties") if isinstance(sch.get("properties"), dict) \
        else {}
    out_obj: dict = {}
    required = sch.get("required") if isinstance(sch.get("required"), list) \
        else []
    for k in required:
        if isinstance(k, str):
            out_obj[k] = targeted_value(rng, props.get(k, True), root,
                                        budget - 1)
    for k, sub in props.items():
        if k not in out_obj and rng.random() < 0.6:
            out_obj[k] = targeted_value(rng, sub, root, budget - 1)
    lo = sch.get("minProperties")
    if isinstance(lo, int):
        extra = sch.get("additionalProperties", True)
        pool = [k for k in KEYS if k not in out_obj] + ["z0", "z1"]
        for k in pool:
            if len(out_obj) >= lo:
                break
            out_obj[k] = targeted_value(
                rng, extra if isinstance(extra, (dict, bool)) else True,
                root, budget - 1)
    hi = sch.get("maxProperties")
    if isinstance(hi, int):
        while len(out_obj) > hi:
            out_obj.pop(next(iter(out_obj)))
    return out_obj


def mutate(rng: random.Random, doc: Any, n_edits: int = 1) -> Any:
    """Randomly perturb a synthesized instance: each edit picks a random
    path and drops/adds/replaces/tweaks there — turning near-valid docs
    into near-miss negatives that fail DEEP, not at the root type."""
    doc = json.loads(json.dumps(doc)) if isinstance(doc, (dict, list)) \
        else doc
    for _ in range(n_edits):
        # collect all container nodes
        nodes = []
        stack = [doc]
        while stack:
            n = stack.pop()
            if isinstance(n, (dict, list)):
                nodes.append(n)
                stack.extend(n.values() if isinstance(n, dict) else n)
        if not nodes:
            return rng.choice(SCALARS)
        tgt = rng.choice(nodes)
        r = rng.random()
        if isinstance(tgt, dict):
            if tgt and r < 0.35:
                tgt.pop(rng.choice(sorted(tgt)))
            elif r < 0.6:
                tgt[rng.choice(KEYS + ["z9"])] = rng.choice(SCALARS)
            elif tgt:
                k = rng.choice(sorted(tgt))
                v = tgt[k]
                tgt[k] = (v + 1 if isinstance(v, (int, float))
                          and not isinstance(v, bool)
                          else v + "!" if isinstance(v, str)
                          else rng.choice(SCALARS))
        else:
            if tgt and r < 0.35:
                tgt.pop(rng.randrange(len(tgt)))
            elif r < 0.6:
                tgt.append(rng.choice(SCALARS))
            elif tgt:
                tgt.append(tgt[rng.randrange(len(tgt))])  # dup → uniqueItems
    return doc
