"""Driver-side schema registry: $id / $anchor / $ref resolution.

From-scratch re-expression of the reference's registration +
preprocessing pass (``loaders/SchemasRegistry.java:34-109``,
``loaders/SchemaPreprocessor.java:22-233``): every schema resource is
registered under its canonical URI, anchors and dynamic anchors are
collected per resource, and every node is tagged with its effective
base URI so ``$ref`` resolution is a pure dict lookup at compile time.
Runs entirely on the Spark driver — executors never resolve schemas.
"""

from __future__ import annotations

import json
import re
import unicodedata
import urllib.parse
from typing import Any, Callable, Optional

__all__ = [
    "SchemaRegistry",
    "SchemaResolutionError",
    "SchemaDialectError",
    "json_pointer_get",
]


_MISSING = object()


class SchemaCompileError(Exception):
    """Schema rejected at compile time — the analogue of the
    reference's SchemaCompileException/checkIt guards."""


class SchemaResolutionError(SchemaCompileError):
    """$ref / $id resolution failure: a species of compile error (the
    reference raises LocatedSchemaCompileException for these too)."""


class SchemaDialectError(SchemaCompileError):
    """A schema's meta-schema requires a vocabulary this engine does not
    implement — a species of compile error, mirroring
    ``dialects/DialectResolver.java:53-79`` (the reference throws its
    compile exception there too)."""


# official vocabulary URIs this engine implements (per dialect
# generation); a custom meta-schema may require any subset of these.
_KNOWN_VOCABULARIES = frozenset(
    f"https://json-schema.org/draft/{gen}/vocab/{name}"
    for gen, names in (
        ("2019-09", ("core", "applicator", "validation", "meta-data",
                     "format", "content")),
        ("2020-12", ("core", "applicator", "validation", "meta-data",
                     "unevaluated", "content", "format-annotation",
                     "format-assertion")),
    )
    for name in names
)

_FORMAT_ASSERTION_VOCAB = "https://json-schema.org/draft/2020-12/vocab/format-assertion"

# exact-match official meta-schema URIs -> dialect. Matching must be
# exact, not substring: suite fixtures use custom meta URIs like
# ".../draft2020-12/format-assertion-false.json" that embed the draft
# name but carry their own $vocabulary.
_OFFICIAL_DIALECTS: dict[str, str] = {}
for _scheme in ("http", "https"):
    _OFFICIAL_DIALECTS[f"{_scheme}://json-schema.org/draft/2020-12/schema"] = "2020-12"
    _OFFICIAL_DIALECTS[f"{_scheme}://json-schema.org/draft/2019-09/schema"] = "2019-09"
    for _d in ("draft-07", "draft-06", "draft-04"):
        _OFFICIAL_DIALECTS[f"{_scheme}://json-schema.org/{_d}/schema"] = "draft7"


# keywords whose value is a schema / container of schemas, for the scan
# walk — PER DIALECT: the reference routes preprocessing only through
# the dialect's registered compilers (SchemaPreprocessor.java:223-231),
# so subschemas under a keyword the draft does not know (e.g. "$defs"
# in draft7, "definitions" in 2019+, any custom keyword) are NEVER
# walked and their anchors/$ids are not collected (reference-probe
# verified: draft7 $defs-anchor $ref is a compile error). Dialect sets
# follow each compiler's getVocabularies: DefinitionsCompiler=draft-07
# core only, DefsCompiler=2019+2020, DependenciesCompiler=all three,
# contentSchema=2019+2020, prefixItems=2020, additionalItems=07+2019.
_ALL_DIALECTS = frozenset(("draft7", "2019-09", "2020-12"))
_POST7 = frozenset(("2019-09", "2020-12"))
_WALK_MAP = {
    "properties": _ALL_DIALECTS,
    "patternProperties": _ALL_DIALECTS,
    "dependentSchemas": _POST7,
    "$defs": _POST7,
    "definitions": frozenset(("draft7",)),
}
_WALK_LIST = {
    "allOf": _ALL_DIALECTS,
    "anyOf": _ALL_DIALECTS,
    "oneOf": _ALL_DIALECTS,
    "prefixItems": frozenset(("2020-12",)),
}
_WALK_SINGLE = {
    "additionalProperties": _ALL_DIALECTS,
    "additionalItems": frozenset(("draft7", "2019-09")),
    "unevaluatedItems": _POST7,
    "unevaluatedProperties": _POST7,
    "propertyNames": _ALL_DIALECTS,
    "not": _ALL_DIALECTS,
    "if": _ALL_DIALECTS,
    "then": _ALL_DIALECTS,
    "else": _ALL_DIALECTS,
    "contains": _ALL_DIALECTS,
    "contentSchema": _POST7,
}


def _unescape_pointer_token(tok: str) -> str:
    return urllib.parse.unquote(tok).replace("~1", "/").replace("~0", "~")


def json_pointer_get(doc: Any, pointer: str) -> Any:
    """Navigate a JSON pointer ("" or "/a/0/b") into a parsed document."""
    node = doc
    if pointer in ("", "/"):
        return node if pointer == "" else _step(node, "")
    for tok in pointer.lstrip("/").split("/"):
        node = _step(node, _unescape_pointer_token(tok))
    return node


def _step(node: Any, tok: str) -> Any:
    if isinstance(node, dict):
        if tok not in node:
            raise SchemaResolutionError(f"pointer token {tok!r} not found")
        return node[tok]
    if isinstance(node, list):
        try:
            return node[int(tok)]
        except (ValueError, IndexError) as e:
            raise SchemaResolutionError(f"bad array index {tok!r}") from e
    raise SchemaResolutionError(f"cannot index {type(node).__name__} with {tok!r}")


def _strip_fragment(uri: str) -> str:
    return uri.split("#", 1)[0]


def _resolve_uri(base: str, ref: str) -> str:
    if not base:
        return ref
    return urllib.parse.urljoin(base, ref)


# java.net.URI character classes (URI.java javadoc): unreserved
# alnum + "_-!.~'()*", punct ",;:$&+=", reserved adds "?/[]@" — with
# '[' ']' legal only inside the authority component; '%' must start a
# two-hex-digit escape; at most one '#'; non-ASCII "other" characters
# are allowed unless they are Unicode space (Zs/Zl/Zp) or ISO control.
_URI_CHARS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    "_-!.~'()*,;:$&+=?/@")
_SCHEME_RE = re.compile(r"[A-Za-z][A-Za-z0-9+.\-]*\Z")
_BAD_PCT = re.compile(r"%(?![0-9A-Fa-f]{2})")


def _java_uri_error(s: str) -> Optional[str]:
    """Why ``java.net.URI`` would reject ``s`` (None = accepted).

    The reference URI-validates every REGISTERED resource ``$id``
    (``SchemaPreprocessor.resolveId`` → ``URI.create``,
    reference-probe: whitespace/brace/backslash/bad-%% ids are compile
    errors in every position incl. never-compiled $defs) and the
    non-blank PATH part of a ref (``applyDefaultResolution``). Ref
    fragments are NOT URI-validated (they go through URLDecoder
    instead — see resolve_ref)."""
    if _BAD_PCT.search(s):
        return "malformed percent escape"
    # authority span, where '[' ']' (IPv6 literals) are legal
    auth_lo = auth_hi = -1
    m = re.search(r"//", s)
    if m is not None and not any(c in s[:m.start()] for c in "/?#"):
        auth_lo = m.end()
        auth_hi = min((s.find(c, auth_lo) % (len(s) + 1)
                       for c in "/?#"), default=len(s))
    seen_hash = False
    for i, ch in enumerate(s):
        cp = ord(ch)
        if cp >= 0x80:
            if unicodedata.category(ch) in ("Zs", "Zl", "Zp") \
                    or 0x7F <= cp <= 0x9F:
                return f"illegal character {ch!r}"
            continue
        if ch == "#":
            if seen_hash:
                return "second '#'"
            seen_hash = True
            continue
        if ch in "[]":
            if not (auth_lo <= i < auth_hi):
                return f"'{ch}' outside authority"
            continue
        if ch == "%" or ch in _URI_CHARS:
            continue
        return f"illegal character {ch!r}"
    # scheme syntax: a ':' before any '/?#' marks the scheme
    for i, ch in enumerate(s):
        if ch in "/?#":
            break
        if ch == ":":
            if not _SCHEME_RE.match(s[:i] or " "):
                return f"invalid scheme {s[:i]!r}"
            break
    return None


def _urldecode_fragment(fragment: str) -> str:
    """Reference fragment handling (``resolveFragment``,
    ``SchemasRegistry.java:406-421``): ``URLDecoder.decode`` — FORM
    decoding, so '+' becomes a space and a malformed %%-escape throws —
    applied before JSON-pointer compilation / anchor lookup."""
    if _BAD_PCT.search(fragment):
        raise SchemaCompileError(
            f"malformed percent escape in fragment {fragment!r}")
    return urllib.parse.unquote_plus(fragment)


class SchemaRegistry:
    """Registry of schema resources keyed by canonical URI.

    ``add(schema, uri)`` scans the document, registering every embedded
    ``$id`` resource, ``$anchor`` / ``$dynamicAnchor`` target, draft-07
    fragment-only ``$id`` anchors, and tagging each dict node with its
    effective base URI and dialect.
    """

    def __init__(self, default_dialect: str = "draft7",
                 loader: Optional[Callable[[str], Any]] = None,
                 loaders: Optional[dict[str, Callable[[str], Any]]] = None,
                 embedded_spec_enabled: bool = True):
        from ..sources.loaders import ResourceLoaderChain

        self.default_dialect = default_dialect
        self.docs: dict[str, Any] = {}  # resource uri -> schema node
        self.anchors: dict[tuple[str, str], Any] = {}
        self.dynamic_anchors: dict[tuple[str, str], Any] = {}
        self.recursive_roots: set[str] = set()  # resources w/ $recursiveAnchor:true at root
        self._base_by_nodeid: dict[int, str] = {}
        self._dialect_by_nodeid: dict[int, str] = {}
        self._fa_by_nodeid: dict[int, bool] = {}  # format-assertion vocab enabled
        self._keepalive: list[Any] = []  # hold scanned docs so id() stays valid
        self.loader = loader  # legacy catch-all uri -> parsed schema
        # scheme-dispatched chain: catch-all > user per-scheme > built-in
        # file/http(s) > embedded official meta-schemas
        # (BaseResourceLoader.java:22-60 + OriginalSpecResolver appended
        # last, SchemaBuilder.java:358-360). Driver-only I/O.
        self.loader_chain = ResourceLoaderChain(
            loaders, catch_all=loader,
            embedded_spec_enabled=embedded_spec_enabled)
        # $id -> actual location URI ("this id really lives over there"),
        # the id→URI external-resolver form
        # (loaders/ExternalResolversHelper.java:1-101; the id→schema form
        # is plain `add`)
        self.uri_mappings: dict[str, str] = {}
        # raw ref path -> (document, location-uri) direct mappings
        # (mapIdToSchema / mapIdToUriAndSchema forms)
        self.schema_mappings: dict[str, tuple[Any, str]] = {}
        # raw ref path -> canonical root uri of the doc a mapping loaded
        # (one load per mapping; reference finds repeats via origin map)
        self._mapped_docs: dict[str, str] = {}
        # uri -> (dialect, fa) | None | SchemaDialectError (re-raised)
        self._meta_cache: dict[str, Any] = {}
        self._synthetic = 0
        # duplicate-anchor guard bookkeeping: (kind, base, name) ->
        # registration pass that last wrote it (see _put_anchor)
        self._scan_pass = 0
        self._anchor_pass: dict[tuple[str, str, str], int] = {}

    # ------------------------------------------------------------ scan

    def add(self, schema: Any, uri: str = "", dialect: Optional[str] = None) -> str:
        """Register a schema document; returns its canonical root URI."""
        if isinstance(schema, str):
            schema = json.loads(schema)
        self._keepalive.append(schema)
        dialect = dialect or self._dialect_of(schema) or self.default_dialect
        root_uri = uri
        if isinstance(schema, dict):
            # only "$id" names a resource; the draft-4 legacy "id" is
            # never read (SchemaPreprocessor.optId reads node.path("$id")
            # only — reference-probe verified: a draft-7 root {"id": ...}
            # is not addressable). In draft-7 a "$ref" sibling suppresses
            # the $id entirely (isValidIdInEarlyVersions,
            # SchemaPreprocessor.java:54-64) — root node included.
            declared = schema.get("$id")
            if (isinstance(declared, str) and not declared.startswith("#")
                    and not (dialect == "draft7" and "$ref" in schema)):
                root_uri = _strip_fragment(_resolve_uri(uri, declared))
        if not root_uri:
            self._synthetic += 1
            root_uri = f"urn:json-schema-spark:anon:{self._synthetic}"
        self.docs[root_uri] = schema
        self._scan_pass += 1
        self._scan(schema, root_uri, dialect)
        return root_uri

    def _dialect_of(self, schema: Any) -> Optional[str]:
        info = self._dialect_info(schema)
        return info[0] if info else None

    def _dialect_info(self, schema: Any) -> Optional[tuple[str, bool]]:
        """(dialect, format_assertions_enabled) declared by a node's
        ``$schema``, resolving custom meta-schemas through the loader
        chain and enforcing their ``$vocabulary``. None when the node
        declares nothing (inherit from the enclosing resource)."""
        if not isinstance(schema, dict):
            return None
        s = schema.get("$schema")
        if not isinstance(s, str):
            return None
        key = _strip_fragment(s)
        official = _OFFICIAL_DIALECTS.get(key)
        if official is not None:
            return official, False
        info = self._custom_meta_info(key)
        if info is not None:
            return info
        # unresolvable custom meta: fall back to the generation named in
        # the URI (lenient — the reference would have fetched it)
        if "2020-12" in s:
            return "2020-12", False
        if "2019-09" in s:
            return "2019-09", False
        if "draft-07" in s or "draft-06" in s or "draft-04" in s:
            return "draft7", False
        return None

    def _custom_meta_info(self, uri: str) -> Optional[tuple[str, bool]]:
        """Resolve a custom meta-schema: derive the base dialect from its
        vocabulary generation (or its own ``$schema``), enable format
        assertions when it declares the format-assertion vocabulary, and
        raise :class:`SchemaDialectError` for unknown REQUIRED
        vocabularies (``DialectResolver.java:53-79``)."""
        cached = self._meta_cache.get(uri, _MISSING)
        if cached is not _MISSING:
            if isinstance(cached, SchemaDialectError):
                raise cached  # keep raising on every compile, not just the first
            return cached
        self._meta_cache[uri] = None  # cycle guard for self-referential metas
        doc = self.docs.get(uri)
        if doc is None:
            doc = self.loader_chain(uri)
        info: Optional[tuple[str, bool]] = None
        if isinstance(doc, dict):
            vocab = doc.get("$vocabulary")
            fa = False
            dialect: Optional[str] = None
            if isinstance(vocab, dict):
                for vuri, required in vocab.items():
                    if vuri == _FORMAT_ASSERTION_VOCAB:
                        # declaring the vocabulary at all means the
                        # dialect performs format assertion
                        fa = True
                    elif vuri not in _KNOWN_VOCABULARIES and required:
                        err = SchemaDialectError(
                            f"meta-schema {uri!r} requires unknown vocabulary {vuri!r}"
                        )
                        self._meta_cache[uri] = err
                        raise err
                gens = [v for v in vocab if isinstance(v, str)]
                if any("/draft/2020-12/" in v for v in gens):
                    dialect = "2020-12"
                elif any("/draft/2019-09/" in v for v in gens):
                    dialect = "2019-09"
            if dialect is None:
                parent = self._dialect_info(doc)
                dialect = parent[0] if parent else None
            info = (dialect or self.default_dialect, fa)
        self._meta_cache[uri] = info
        return info

    def format_assertion_of(self, node: Any) -> bool:
        """True when the node's governing meta-schema declares the
        format-assertion vocabulary (2020-12 custom dialects)."""
        return self._fa_by_nodeid.get(id(node), False)

    def _put_anchor(self, table: dict, base: str, name: str, node: Any,
                    kind: str) -> None:
        """Register, rejecting duplicates within one resource
        (SchemaPreprocessor.java:105,114,133 checkIt 'already exists').
        The guard is per registration pass: re-adding an
        already-collected resource (e.g. the executor-side rebuild
        re-parses each nested-$id subtree as its own doc) overwrites
        instead of raising."""
        key = (base, name)
        meta = (kind, base, name)
        if (table.get(key) is not node
                and self._anchor_pass.get(meta) == self._scan_pass):
            raise SchemaCompileError(
                f"the {kind} {name!r} already exists in resource {base!r}")
        table[key] = node
        self._anchor_pass[meta] = self._scan_pass

    def _scan(self, node: Any, base: str, dialect: str, fa: bool = False,
              root: bool = True) -> None:
        if isinstance(node, bool) or not isinstance(node, dict):
            return
        if root:
            # $schema is honored ONLY at a loaded document's root
            # (registerSchema -> DialectResolver.resolveDialect on the
            # document node, SchemasRegistry.java:77-79); a nested
            # $schema -- even beside $id -- is inert (reference-probe:
            # cross-dialect nested/embedded $schema never switches
            # keyword activity)
            info = self._dialect_info(node)
            if info is not None:
                dialect, fa = info
        post7 = dialect != "draft7"

        # --- $id (SchemaPreprocessor.java:32-64,195-199) ---------------
        rawid = node.get("$id", _MISSING)
        resource_id: Optional[str] = None
        if rawid is not _MISSING:
            if not post7:
                # draft-7 reads textValue() unconditionally: a
                # non-string $id is a compile error (NPE-as-checkIt)
                if not isinstance(rawid, str):
                    raise SchemaCompileError("the draft-7 $id must be a string")
                if rawid.startswith("#"):
                    # plain-name anchor form — registered even beside a
                    # $ref sibling (the plain-id path at :195-199 runs
                    # independently of optId)
                    if len(rawid) <= 1:
                        raise SchemaCompileError("empty plain $id")
                    self._put_anchor(self.anchors, base, rawid[1:], node,
                                     "plain $id")
                elif "$ref" not in node:
                    # draft-7 resource-$id beside $ref is ignored
                    # (isValidIdInEarlyVersions, :54-64)
                    resource_id = rawid
            elif isinstance(rawid, str):
                # post-draft-7: a non-string $id is silently ignored
                # (optId filters isTextual, :47-52)
                resource_id = rawid
        if resource_id is not None:
            uri_err = _java_uri_error(resource_id)
            if uri_err is not None:
                # resolveId URI.create throws (reference-probe: every
                # registered position, reached or not, every dialect —
                # only draft-7 $ref-suppressed ids escape validation)
                raise SchemaCompileError(
                    f"invalid $id {resource_id!r}: {uri_err}")
            if urllib.parse.urlsplit(resource_id).fragment:
                # resolveId checkIt (:35): a resource $id must not
                # carry a non-empty fragment (empty '#' is fine)
                raise SchemaCompileError(
                    f"the $id {resource_id!r} can't contain a fragment")
            new_uri = _strip_fragment(_resolve_uri(base, resource_id))
            if new_uri and new_uri != base:
                self.docs[new_uri] = node
                base = new_uri
        self._base_by_nodeid[id(node)] = base
        self._dialect_by_nodeid[id(node)] = dialect
        if fa:
            self._fa_by_nodeid[id(node)] = True

        # --- anchors: strictly per-dialect (each keyword's compiler
        # registers only its own draft's vocabulary; elsewhere it is an
        # unknown keyword, ignored even with a malformed argument) ------
        if "$anchor" in node and post7:
            anch = node["$anchor"]
            if not isinstance(anch, str):
                raise SchemaCompileError("the $anchor must be a string")
            self._put_anchor(self.anchors, base, anch, node, "$anchor")
        if "$dynamicAnchor" in node and dialect == "2020-12":
            dyn = node["$dynamicAnchor"]
            if not isinstance(dyn, str):
                raise SchemaCompileError("the $dynamicAnchor must be a string")
            self._put_anchor(self.dynamic_anchors, base, dyn, node,
                             "$dynamicAnchor")
            # a $dynamicAnchor is also a plain $ref target
            self.anchors.setdefault((base, dyn), node)
        if "$recursiveAnchor" in node and dialect == "2019-09":
            ra = node["$recursiveAnchor"]
            if not isinstance(ra, bool):
                raise SchemaCompileError("the $recursiveAnchor must be a boolean")
            # the reference marks the ENCLOSING RESOURCE, wherever the
            # keyword sits (onRecursiveAnchor resolves getSubSchema(
            # parentId) and markRecursiveAnchor overwrites — last seen
            # in walk order wins; reference-probe verified with a
            # nested-in-$defs marker changing $recursiveRef landing)
            if ra:
                self.recursive_roots.add(base)
            else:
                self.recursive_roots.discard(base)

        for kw, dialects in _WALK_MAP.items():
            if dialect not in dialects:
                continue
            sub = node.get(kw)
            if isinstance(sub, dict):
                for v in sub.values():
                    self._scan(v, base, dialect, fa, root=False)
        for kw, dialects in _WALK_LIST.items():
            if dialect not in dialects:
                continue
            sub = node.get(kw)
            if isinstance(sub, list):
                for v in sub:
                    self._scan(v, base, dialect, fa, root=False)
        for kw, dialects in _WALK_SINGLE.items():
            if dialect in dialects and kw in node:
                self._scan(node[kw], base, dialect, fa, root=False)
        items = node.get("items")
        if isinstance(items, list):
            # list-form items is a schema position only pre-2020-12
            # (Items2020's preprocess skips non-object nodes)
            if dialect != "2020-12":
                for v in items:
                    self._scan(v, base, dialect, fa, root=False)
        elif items is not None:
            self._scan(items, base, dialect, fa, root=False)
        deps = node.get("dependencies")
        if isinstance(deps, dict):
            for v in deps.values():
                if isinstance(v, (dict, bool)):
                    self._scan(v, base, dialect, fa, root=False)

    # --------------------------------------------------------- resolve

    def add_uri_mapping(self, schema_id: str, uri: str) -> None:
        """Map a schema id to the URI it actually lives at; a ``$ref``
        whose RAW path equals the id (matched verbatim, before base
        resolution — ``ExternalResolversHelper.java:20-31`` keys the map
        by ``foundId``) then loads through the loader chain from the
        mapped location, taking precedence over registered resources
        (id→URI external-resolver form — complements ``add`` which
        registers the document directly)."""
        key = _strip_fragment(schema_id)
        self.schema_mappings.pop(key, None)  # one resolver per id
        self.uri_mappings[key] = uri

    def add_schema_mapping(self, schema_id: str, schema: Any,
                           uri: Optional[str] = None) -> None:
        """Map a schema id directly to a document
        (``mapIdToSchema`` / with ``uri`` also ``mapIdToUriAndSchema``,
        ``ExternalResolversHelper.java:33-63``): a ``$ref`` whose RAW
        path equals the id resolves to this document without any
        loader I/O, same precedence as :meth:`add_uri_mapping`."""
        if isinstance(schema, str):
            schema = json.loads(schema)
        key = _strip_fragment(schema_id)
        self.uri_mappings.pop(key, None)  # one resolver per id
        self.schema_mappings[key] = (schema, uri or "")

    def base_of(self, node: Any) -> str:
        return self._base_by_nodeid.get(id(node), "")

    def dialect_of_node(self, node: Any) -> str:
        return self._dialect_by_nodeid.get(id(node), self.default_dialect)

    def resolve_ref(self, ref: str, base: str) -> Any:
        """Resolve ``$ref`` to a schema node (compile-time, driver-side).

        A ref that contributes a path component must resolve to an
        ABSOLUTE URI: the reference resolves every non-fragment ref
        through ``applyDefaultResolution`` (SchemasRegistry.java:369-390)
        which returns null / throws on a non-absolute result, so embedded
        resources whose ``$id`` resolved relative (no absolute base in
        scope — anonymous root, or a draft-7 root whose ``$id`` was
        suppressed by a ``$ref`` sibling) are registered but UNREACHABLE
        (reference-probe verified). Fragment-only refs stay in the
        current resource regardless of its base's shape."""
        raw_path, _, raw_frag = ref.partition("#")
        if raw_path and raw_path.strip() == "":
            # RefResolutionResult.hasPath uses isBlank(): a whitespace-
            # only path part means "no path" — same-document ref. (With
            # no fragment either, the reference self-loops into a stack
            # overflow at validation; the compile error below is our
            # documented sane verdict for that corner.)
            ref = "#" + raw_frag
            raw_path = ""
        elif raw_path:
            uri_err = _java_uri_error(raw_path)
            if uri_err is not None:
                # applyDefaultResolution URI.create throws on the path
                # part only (fragments are URLDecoder territory)
                raise SchemaCompileError(
                    f"invalid $ref {ref!r}: {uri_err}")
        target = _resolve_uri(base, ref)
        doc_uri, _, fragment = target.partition("#")
        # reference split("#") keeps parts[1] only — a second '#'
        # truncates the fragment rather than erroring
        fragment = fragment.partition("#")[0]
        fragment = _urldecode_fragment(fragment)
        same_doc = not doc_uri
        doc_uri = doc_uri or base.split("#", 1)[0]
        relative = (not same_doc
                    and not urllib.parse.urlsplit(doc_uri).scheme)
        doc = None
        # external id→URI mappings are keyed by the RAW ref path (no
        # base resolution: ExternalResolversHelper.resolve(foundId) gets
        # resolution.getPath() verbatim) and are consulted BEFORE any
        # registered resource (resolvePath tries the external resolver
        # first, SchemasRegistry.java:307-326) — so a mapping can serve
        # a relative ref with no absolute base, and overrides an
        # embedded resource registered under the same id
        if raw_path and (raw_path in self.schema_mappings
                         or raw_path in self.uri_mappings):
            canon = self._mapped_docs.get(raw_path)
            if canon is None:
                direct = self.schema_mappings.get(raw_path)
                if direct is not None:
                    loaded, at = direct
                else:
                    at = self.uri_mappings[raw_path]
                    loaded = self.loader_chain(at)
                if loaded is not None:
                    canon = self.add(loaded, at)
                    self._mapped_docs[raw_path] = canon
            if canon is not None:
                doc = self.docs.get(canon)
                doc_uri = canon
        if doc is None and not relative:
            # a relative target never matches registry entries
            doc = self.docs.get(doc_uri)
        if doc is None:
            loaded = self.loader_chain(doc_uri)
            if loaded is not None:
                self.add(loaded, doc_uri)
                # keep the request URI addressable even when the loaded
                # document declares a different canonical $id
                self.docs.setdefault(doc_uri, loaded)
                doc = self.docs.get(doc_uri)
        if doc is None:
            # the ref may target an anchor in an already-known resource
            if not relative and fragment and (doc_uri, fragment) in self.anchors:
                return self.anchors[(doc_uri, fragment)]
            raise SchemaResolutionError(f"unknown schema resource: {doc_uri!r}")
        if not fragment:
            return doc
        if fragment.startswith("/"):
            node = json_pointer_get(doc, fragment)
            if isinstance(node, dict) and id(node) not in self._base_by_nodeid:
                self._scan_pass += 1
                self._scan(node, doc_uri, self.dialect_of_node(doc),
                           self._fa_by_nodeid.get(id(doc), False), root=False)
            return node
        key = (doc_uri, fragment)
        if key in self.anchors:
            return self.anchors[key]
        raise SchemaResolutionError(f"unknown anchor {fragment!r} in {doc_uri!r}")

    def resolve_dynamic(self, name: str, scope: tuple[str, ...]) -> Optional[Any]:
        """Outermost dynamic-anchor resolution along the runtime scope
        chain (``loaders/SchemasRegistry.java:183-224`` semantics)."""
        for uri in scope:
            node = self.dynamic_anchors.get((uri, name))
            if node is not None:
                return node
        return None

    def resolve_recursive(self, scope: tuple[str, ...]) -> Optional[Any]:
        """Oldest ancestor resource with ``$recursiveAnchor: true``."""
        for uri in scope:
            if uri in self.recursive_roots:
                return self.docs[uri]
        return None
