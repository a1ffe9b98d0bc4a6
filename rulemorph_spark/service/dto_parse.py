"""DTO *source* parsers for rule generation.

The MCP tool ``generate_rules_from_dto`` accepts a DTO definition in
one of seven languages and synthesizes candidate mappings whose targets
follow the DTO's JSON shape.  This module extracts that shape: for each
declared type, an ordered list of fields with their JSON key (honoring
per-language rename annotations), a primitive kind, and optionality.

Behavior parity with the reference's line-oriented extractors
(``rulemorph_mcp/src/main.rs:2475-4088``): same language set, same
rename annotations (serde ``rename``, pydantic ``alias``, Go ``json:``
tags, Jackson/Gson ``@JsonProperty``/``@SerializedName``, kotlinx
``@SerialName``/Moshi ``@Json(name=)``, Swift ``CodingKeys``), same
optionality rules, same primitive-kind mapping.  The implementation is
original Python: a shared tokenizer-normalizer plus small per-language
line parsers.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# Primitive kinds understood by rule `type:` casts.
STRING, INT, FLOAT, BOOL = "string", "int", "float", "bool"


@dataclass
class DtoField:
    json_key: str
    kind: str | None = None      # string/int/float/bool, or None (unknown)
    ref: str | None = None       # nested DTO type name
    optional: bool = False


@dataclass
class DtoType:
    fields: list[DtoField] = field(default_factory=list)


@dataclass
class DtoSchema:
    root: str
    types: dict[str, DtoType]


class DtoParseError(ValueError):
    pass


LANGUAGES = ("rust", "typescript", "python", "go", "java", "kotlin",
             "swift")


def parse_dto_schema(text: str, language: str) -> DtoSchema:
    lang = language.lower()
    parser = {
        "typescript": _parse_typescript,
        "rust": _parse_rust,
        "python": _parse_python,
        "go": _parse_go,
        "java": _parse_java,
        "kotlin": _parse_kotlin,
        "swift": _parse_swift,
    }.get(lang)
    if parser is None:
        raise DtoParseError(
            "dto_language must be rust, typescript, python, go, java, "
            "kotlin, or swift")
    types, order = parser(text)
    if "Record" in types:
        root = "Record"
    elif order:
        root = order[0]
    else:
        raise DtoParseError("no dto types found")
    return DtoSchema(root=root, types=types)


# ---------------------------------------------------------------------
# shared normalization: split single-line declarations into one
# field per line, respecting strings / comments / bracket nesting
# ---------------------------------------------------------------------

def _normalize(text: str, *, split_semicolons=True, split_commas=False,
               split_commas_in_parens=False, newline_after_brace=True,
               track_angles=True) -> str:
    """Insert newlines after structural separators so each field lands
    on its own line.  Separators inside strings, comments, or nested
    ``<> () []`` groups are left alone."""
    out: list[str] = []
    i, n = 0, len(text)
    angle = paren = bracket = 0
    while i < n:
        ch = text[i]
        nxt = text[i + 1] if i + 1 < n else ""
        if ch == "/" and nxt == "/":  # line comment
            j = text.find("\n", i)
            j = n if j < 0 else j
            out.append(text[i:j])
            i = j
            continue
        if ch == "/" and nxt == "*":  # block comment
            j = text.find("*/", i + 2)
            j = n - 2 if j < 0 else j
            out.append(text[i:j + 2])
            i = j + 2
            continue
        if ch in "\"'`":  # string literal
            j = i + 1
            while j < n:
                if text[j] == "\\":
                    j += 2
                    continue
                if text[j] == ch:
                    break
                j += 1
            out.append(text[i:min(j + 1, n)])
            i = j + 1
            continue
        if track_angles and ch == "<":
            angle += 1
        elif track_angles and ch == ">":
            angle = max(0, angle - 1)
        elif ch == "(":
            paren += 1
        elif ch == ")":
            paren = max(0, paren - 1)
        elif ch == "[":
            bracket += 1
        elif ch == "]":
            bracket = max(0, bracket - 1)
        out.append(ch)
        depth0 = angle == 0 and paren == 0 and bracket == 0
        if ch == "{" and newline_after_brace:
            out.append("\n")
        elif ch == "}" and newline_after_brace:
            out.insert(len(out) - 1, "\n")
            out.append("\n")
        elif ch == ";" and split_semicolons and depth0:
            out.append("\n")
        elif ch == "," and depth0 and split_commas:
            out.append("\n")
        elif (ch == "," and split_commas_in_parens and paren > 0
              and angle == 0 and bracket == 0):
            out.append("\n")
        i += 1
    return "".join(out)


def _first_quoted(text: str) -> str | None:
    m = re.search(r"""["']([^"']*)["']""", text)
    return m.group(1) if m else None


def _quoted_after(line: str, marker: str) -> str | None:
    pos = line.find(marker)
    if pos < 0:
        return None
    return _first_quoted(line[pos + len(marker):])


# ---------------------------------------------------------------------
# TypeScript
# ---------------------------------------------------------------------

_TS_PRIMS = {"string": STRING, "number": FLOAT, "boolean": BOOL}


def _parse_typescript(text: str):
    types: dict[str, DtoType] = {}
    order: list[str] = []
    current: str | None = None
    pending_key: str | None = None

    for raw in _normalize(text, track_angles=False).splitlines():
        line = raw.strip()
        if not line:
            continue
        m = re.match(r"(?:export\s+)?interface\s+([A-Za-z_]\w*)", line)
        if m:
            current = m.group(1)
            pending_key = None
            types.setdefault(current, DtoType())
            order.append(current)
            continue
        if current is None:
            continue
        if line.startswith("}"):
            current = pending_key = None
            continue
        # `/* json:"key" */` comment pins the JSON key for the next field
        cm = re.match(r".*?json:\s*\"([^\"]*)\"", line)
        if cm and ("//" in line or "/*" in line):
            pending_key = cm.group(1)
            end = line.find("*/")
            line = line[end + 2:].strip() if end >= 0 else ""
            if not line:
                continue
        if ":" not in line:
            continue
        name_part, _, type_part = line.rstrip(";").partition(":")
        name_part, type_part = name_part.strip(), type_part.strip()
        if not name_part or not type_part:
            continue
        optional = name_part.endswith("?")
        fname = name_part.rstrip("?").strip()
        token = re.split(r"[|&]", type_part)[0].strip().rstrip(";")
        f = DtoField(json_key=pending_key or fname, optional=optional)
        pending_key = None
        if "[" in token or token in ("unknown", "any", ""):
            pass  # unknown kind
        elif token in _TS_PRIMS:
            f.kind = _TS_PRIMS[token]
        else:
            f.ref = token
        types[current].fields.append(f)
    return types, order


# ---------------------------------------------------------------------
# Rust
# ---------------------------------------------------------------------

_RUST_INTS = {"i8", "i16", "i32", "i64", "isize",
              "u8", "u16", "u32", "u64", "usize"}


def _parse_rust(text: str):
    types: dict[str, DtoType] = {}
    order: list[str] = []
    current: str | None = None
    pending_key: str | None = None

    for raw in _normalize(text, split_commas=True).splitlines():
        line = raw.strip()
        if not line:
            continue
        m = re.match(r"pub\s+struct\s+([A-Za-z_]\w*)", line)
        if m:
            current = m.group(1)
            pending_key = None
            types.setdefault(current, DtoType())
            order.append(current)
            continue
        if current is None:
            continue
        if line.startswith("}"):
            current = pending_key = None
            continue
        if line.startswith("#[serde"):
            rn = _quoted_after(line, "rename")
            if rn is not None:
                pending_key = rn
            end = line.find("]")
            line = line[end + 1:].strip() if end >= 0 else ""
            if not line:
                continue
        if not line.startswith("pub "):
            continue
        body = line[4:].rstrip(",").strip()
        fname, _, type_part = body.partition(":")
        fname, type_part = fname.strip(), type_part.replace(" ", "")
        if not fname or not type_part:
            continue
        optional = False
        if type_part.startswith("Option<") and type_part.endswith(">"):
            optional = True
            type_part = type_part[7:-1]
        key = type_part.rsplit("::", 1)[-1]
        f = DtoField(json_key=pending_key or fname, optional=optional)
        pending_key = None
        if key == "String":
            f.kind = STRING
        elif key == "bool":
            f.kind = BOOL
        elif key in _RUST_INTS:
            f.kind = INT
        elif key in ("f32", "f64"):
            f.kind = FLOAT
        elif not key.endswith("Value"):
            f.ref = key
        types[current].fields.append(f)
    return types, order


# ---------------------------------------------------------------------
# Python (dataclass / pydantic style annotations)
# ---------------------------------------------------------------------

def _py_unwrap_type(token: str) -> tuple[str, bool]:
    """Strip Optional[...] / Union[..., None] / `X | None`; returns
    (inner type token, optional)."""
    token = token.strip()
    optional = ("Optional[" in token or "None" in token)
    m = re.search(r"Optional\[([^\]]*)\]", token)
    if m:
        return m.group(1).strip(), True
    m = re.search(r"Union\[([^\]]*)\]", token)
    if m:
        parts = [p.strip() for p in m.group(1).split(",")]
        inner = next((p for p in parts if "None" not in p), parts[0])
        return inner, optional
    if "|" in token:
        parts = [p.strip() for p in token.split("|")]
        inner = next((p for p in parts if "None" not in p), parts[0])
        return inner, optional
    return token, optional


_PY_PRIMS = {"str": STRING, "string": STRING, "int": INT, "float": FLOAT,
             "bool": BOOL, "boolean": BOOL}


def _parse_python(text: str):
    types: dict[str, DtoType] = {}
    order: list[str] = []
    current: str | None = None
    current_indent: int | None = None

    for raw in _normalize(text, newline_after_brace=False,
                          track_angles=False).splitlines():
        indent = len(raw) - len(raw.lstrip())
        line = raw.strip()
        class_line = False
        if not line or line.startswith("#"):
            continue
        m = re.match(r"class\s+([A-Za-z_]\w*)", line)
        if m:
            class_line = True
            current = m.group(1)
            current_indent = indent
            types.setdefault(current, DtoType())
            order.append(current)
            colon = line.find(":", m.end())
            if colon < 0:
                continue
            line = line[colon + 1:].strip()
            if not line:
                continue
        if (current_indent is not None and not class_line
                and indent <= current_indent and line):
            current = current_indent = None
        if current is None or line.startswith("@"):
            continue
        line = line.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        fname, _, rest = line.partition(":")
        fname, rest = fname.strip(), rest.rstrip(";").strip()
        if not fname or not rest or not re.match(r"[A-Za-z_]\w*$", fname):
            continue
        optional = False
        value_part = ""
        if "=" in rest:
            rest, _, value_part = rest.partition("=")
            rest = rest.strip()
            if "None" in value_part:
                optional = True
        token, opt2 = _py_unwrap_type(rest)
        optional = optional or opt2
        token = token.removeprefix("typing.")
        f = DtoField(json_key=fname, optional=optional)
        alias = re.search(r"""alias\s*=\s*["']([^"']*)["']""",
                          line)
        if alias:
            f.json_key = alias.group(1)
        if ("[" in token or re.search(r"\b(List|Dict|list|dict)\b", token)
                or token in ("Any", "any", "")):
            pass
        elif token in _PY_PRIMS:
            f.kind = _PY_PRIMS[token]
        else:
            f.ref = token
        types[current].fields.append(f)
    return types, order


# ---------------------------------------------------------------------
# Go
# ---------------------------------------------------------------------

_GO_INTS = {"int", "int8", "int16", "int32", "int64",
            "uint", "uint8", "uint16", "uint32", "uint64", "uintptr"}

_GO_FIELD = re.compile(
    r"([A-Za-z_]\w*)\s+(\*?[\w.\[\]]+)\s*(?:`([^`]*)`)?")


def _parse_go(text: str):
    types: dict[str, DtoType] = {}
    order: list[str] = []
    # strip comments
    text = re.sub(r"//[^\n]*", "", text)
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)

    for m in re.finditer(r"type\s+([A-Za-z_]\w*)\s+struct\s*{", text):
        name = m.group(1)
        depth, i = 1, m.end()
        while i < len(text) and depth:
            if text[i] == "{":
                depth += 1
            elif text[i] == "}":
                depth -= 1
            i += 1
        body = text[m.end():i - 1]
        dto = types.setdefault(name, DtoType())
        order.append(name)
        for fm in _GO_FIELD.finditer(body):
            fname, ftype, tag = fm.group(1), fm.group(2), fm.group(3)
            json_key, tag_optional, skip = _go_json_tag(tag)
            if skip:
                continue
            optional = tag_optional
            if ftype.startswith("*"):
                optional = True
                ftype = ftype[1:]
            f = DtoField(json_key=json_key or fname, optional=optional)
            if "[" in ftype or ftype.startswith("map["):
                pass
            elif ftype == "string":
                f.kind = STRING
            elif ftype == "bool":
                f.kind = BOOL
            elif ftype in _GO_INTS:
                f.kind = INT
            elif ftype in ("float32", "float64"):
                f.kind = FLOAT
            elif ftype:
                f.ref = ftype.rsplit(".", 1)[-1]
            dto.fields.append(f)
    return types, order


def _go_json_tag(tag: str | None) -> tuple[str | None, bool, bool]:
    if not tag:
        return None, False, False
    m = re.search(r'json:"([^"]*)"', tag)
    if not m:
        return None, False, False
    content = m.group(1)
    if content == "-":
        return None, False, True
    parts = content.split(",")
    name = parts[0] or None
    omitempty = any(p.strip() == "omitempty" for p in parts[1:])
    return name, omitempty, False


# ---------------------------------------------------------------------
# Java / Kotlin shared annotation handling
# ---------------------------------------------------------------------

_RENAME_ANNOS = ("@JsonProperty", "@SerializedName", "@SerialName",
                 "@Json")


def _strip_annotations(line: str) -> tuple[str, str | None, bool]:
    """Peel leading ``@Anno(...)`` prefixes; returns
    (rest, rename or None, nullable)."""
    rename: str | None = None
    nullable = False
    rest = line.strip()
    while rest.startswith("@"):
        for anno in _RENAME_ANNOS:
            if rest.startswith(anno):
                q = _quoted_after(rest, anno)
                if q is not None:
                    rename = q
                break
        if rest.startswith("@Nullable"):
            nullable = True
        close = rest.find(")")
        if close >= 0:
            rest = rest[close + 1:].strip()
        elif " " in rest:
            rest = rest.split(" ", 1)[1].strip()
        else:
            return "", rename, nullable
        if not rest:
            return "", rename, nullable
    return rest, rename, nullable


_JAVA_MODIFIERS = ("public", "private", "protected", "static", "final",
                   "transient", "volatile")

_JAVA_INTS = {"byte", "short", "int", "long", "Byte", "Short", "Integer",
              "Long"}
_JAVA_FLOATS = {"float", "double", "Float", "Double"}


def _java_field(line: str, rename: str | None,
                nullable: bool) -> DtoField | None:
    cleaned = line.split("//", 1)[0].split("=", 1)[0]
    cleaned = cleaned.strip().rstrip(";").rstrip(",").strip()
    if not cleaned:
        return None
    words = cleaned.split()
    while words and words[0] in _JAVA_MODIFIERS:
        words.pop(0)
    if len(words) < 2:
        return None
    type_part = " ".join(words[:-1])
    fname = words[-1]
    optional = nullable or "Optional<" in type_part.replace(" ", "")
    key = type_part.rsplit(".", 1)[-1].strip().rstrip(">")
    key = key.rsplit("<", 1)[-1].strip()
    f = DtoField(json_key=rename or fname, optional=optional)
    if key == "String":
        f.kind = STRING
    elif key in ("boolean", "Boolean"):
        f.kind = BOOL
    elif key in _JAVA_INTS:
        f.kind = INT
    elif key in _JAVA_FLOATS:
        f.kind = FLOAT
    elif key:
        f.ref = key
    return f


def _parse_java(text: str):
    types: dict[str, DtoType] = {}
    order: list[str] = []
    current: str | None = None
    in_record_params = 0

    for raw in _normalize(text, split_commas_in_parens=True).splitlines():
        line = raw.strip()
        if not line:
            continue
        cm = re.search(r"\b(class|record)\s+([A-Za-z_]\w*)", line)
        if cm:
            current = cm.group(2)
            types.setdefault(current, DtoType())
            order.append(current)
            in_record_params = 0
            if cm.group(1) == "record":
                paren = line.find("(", cm.end())
                if paren >= 0:
                    in_record_params = 1
                    line = line[paren + 1:].strip()
                else:
                    continue
            else:
                continue
        if current is None:
            continue
        if line.startswith("}"):
            current = None
            in_record_params = 0
            continue
        if in_record_params:
            depth = in_record_params + line.count("(") - line.count(")")
            if depth <= 0:
                end = line.rfind(")")
                if end >= 0:
                    line = line[:end].strip()
                in_record_params = 0
            else:
                in_record_params = depth
            if not line:
                continue
            rest, rename, nullable = _strip_annotations(line)
            f = _java_field(rest, rename, nullable) if rest else None
            if f:
                types[current].fields.append(f)
            continue
        rest, rename, nullable = _strip_annotations(line)
        if not rest or ";" not in raw:
            continue
        f = _java_field(rest, rename, nullable)
        if f:
            types[current].fields.append(f)
    return types, order


# ---------------------------------------------------------------------
# Kotlin
# ---------------------------------------------------------------------

_KT_INTS = {"Int", "Long", "Short", "Byte"}


def _parse_kotlin(text: str):
    types: dict[str, DtoType] = {}
    order: list[str] = []
    current: str | None = None
    param_depth = 0

    for raw in _normalize(text, split_commas_in_parens=True).splitlines():
        line = raw.strip()
        if not line:
            continue
        cm = re.search(r"\bclass\s+([A-Za-z_]\w*)", line)
        if cm:
            current = cm.group(1)
            types.setdefault(current, DtoType())
            order.append(current)
            param_depth = 0
            paren = line.find("(", cm.end())
            if paren < 0:
                continue
            param_depth = 1
            line = line[paren + 1:].strip()
        if current is None:
            continue
        if line.startswith("}"):
            current = None
            param_depth = 0
            continue
        if param_depth <= 0:
            continue
        next_depth = param_depth + line.count("(") - line.count(")")
        if next_depth <= 0:
            end = line.rfind(")")
            if end >= 0:
                line = line[:end].strip()
        param_depth = max(next_depth, 0) or param_depth
        if next_depth <= 0:
            param_depth = 0
        if not line:
            continue
        rest, rename, nullable = _strip_annotations(line)
        line = rest.rstrip(",").strip()
        if not line:
            continue
        line = re.sub(r"^(val|var)\s+", "", line)
        fname, _, type_part = line.partition(":")
        fname, type_part = fname.strip(), type_part.strip()
        if not fname or not type_part:
            continue
        optional = nullable or "?" in type_part or "= null" in type_part
        token = type_part.split("=", 1)[0].strip().rstrip("?")
        f = DtoField(json_key=rename or fname, optional=optional)
        if "<" in token:
            pass
        elif token == "String":
            f.kind = STRING
        elif token == "Boolean":
            f.kind = BOOL
        elif token in _KT_INTS:
            f.kind = INT
        elif token in ("Float", "Double"):
            f.kind = FLOAT
        elif token:
            f.ref = token
        types[current].fields.append(f)
    return types, order


# ---------------------------------------------------------------------
# Swift
# ---------------------------------------------------------------------

_SWIFT_INTS = {"Int", "Int8", "Int16", "Int32", "Int64",
               "UInt", "UInt8", "UInt16", "UInt32", "UInt64"}


def _parse_swift(text: str):
    types: dict[str, DtoType] = {}
    order: list[str] = []
    current: str | None = None
    coding_keys: dict[str, str] = {}
    in_coding = False
    coding_depth = 0

    for raw in _normalize(text, split_commas=False).splitlines():
        line = raw.strip()
        if not line:
            continue
        cm = re.search(r"\b(?:struct|class)\s+([A-Za-z_]\w*)", line)
        if cm and not in_coding:
            current = cm.group(1).split(":")[0].split("{")[0]
            types.setdefault(current, DtoType())
            order.append(current)
            coding_keys = {}
            in_coding = False
            coding_depth = 0
        if current is None:
            continue
        opens = line.count("{") - line.count("}")
        if line.startswith("enum CodingKeys"):
            in_coding = True
            coding_depth = opens
            continue
        if in_coding:
            coding_depth += opens
            if line.startswith("case "):
                for fname, rename in _swift_cases(line):
                    coding_keys[fname] = rename
                    for f in types[current].fields:
                        if f.json_key == fname:
                            f.json_key = rename
            if coding_depth <= 0:
                in_coding = False
                coding_depth = 0
            continue
        m = re.match(r"(?:let|var)\s+([A-Za-z_]\w*)\s*:\s*(.+)$", line)
        if not m:
            continue
        fname = m.group(1)
        type_part = m.group(2).rstrip(";").rstrip(",").strip()
        type_part = type_part.split("=", 1)[0].strip()
        optional = "?" in type_part or "Optional<" in type_part
        token = type_part.rstrip("?")
        f = DtoField(json_key=coding_keys.get(fname, fname),
                     optional=optional)
        if "<" in token:
            pass
        elif token == "String":
            f.kind = STRING
        elif token == "Bool":
            f.kind = BOOL
        elif token in _SWIFT_INTS:
            f.kind = INT
        elif token in ("Float", "Double"):
            f.kind = FLOAT
        elif token:
            f.ref = token
        types[current].fields.append(f)
    return types, order


def _swift_cases(line: str) -> list[tuple[str, str]]:
    """``case a = "x", b, c = "y"`` → [(a, x), (b, b), (c, y)]."""
    out = []
    body = line.removeprefix("case ").strip()
    # split on commas outside quotes
    parts, buf, in_str = [], [], False
    for ch in body:
        if ch == '"':
            in_str = not in_str
        if ch == "," and not in_str:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    for part in parts:
        part = part.strip()
        if not part:
            continue
        name, _, value = part.partition("=")
        name = name.strip()
        if not name:
            continue
        rename = _first_quoted(value) if value else None
        out.append((name, rename or name))
    return out


# ---------------------------------------------------------------------
# schema → generated mapping skeletons
# ---------------------------------------------------------------------

@dataclass
class GeneratedMapping:
    target: str
    value_type: str | None
    required: bool


def generate_mappings_from_schema(schema: DtoSchema) -> \
        list[GeneratedMapping]:
    out: list[GeneratedMapping] = []
    _build(schema, schema.root, "", False, set(), out)
    return out


def _build(schema, type_name, prefix, parent_optional, visiting, out):
    if type_name in visiting:
        return
    visiting.add(type_name)
    dto = schema.types.get(type_name)
    if dto is None:
        raise DtoParseError(f"unknown dto type: {type_name}")
    for f in dto.fields:
        target = append_path(prefix, f.json_key)
        optional = parent_optional or f.optional
        if f.ref is not None:
            _build(schema, f.ref, target, optional, visiting, out)
        else:
            out.append(GeneratedMapping(target, f.kind, not optional))
    visiting.discard(type_name)


def append_path(prefix: str, key: str) -> str:
    """Join a path segment, bracket-quoting keys that contain path
    metacharacters (mirrors ``append_path``, main.rs:4218-4235)."""
    if any(ch in key for ch in '.[]"\'\\'):
        escaped = key.replace("\\", "\\\\").replace('"', '\\"')
        segment = f'["{escaped}"]'
    else:
        segment = key
    if not prefix:
        return segment
    if segment.startswith("["):
        return prefix + segment
    return f"{prefix}.{segment}"
