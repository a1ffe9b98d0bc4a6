"""YAML source location index for validation diagnostics.

Maps the validator's dotted/indexed paths (``mappings[0].target``,
``input.csv.delimiter``) to 1-based ``(line, column)`` positions in the
original YAML text, mirroring the reference's location attribution
(``crates/rulemorph/src/locator.rs:1-154``).  Behavioral contract:

- paths use ``parent.key`` for map entries and ``parent[i]`` for
  sequence items; a sequence item is located at its dash, a key at its
  first character (both 1-based columns);
- only the *first* occurrence of a path is recorded;
- top-level sequence items (no parent path) are not indexed;
- a key whose value is empty or a block scalar (``|`` / ``>``) opens a
  scope for nested entries; inline flow values do not, so positions
  inside flow collections resolve to the owning key only.

This runs once per rule file on the driver (YAML rule files are tiny),
so a plain line scan is the right tool — no Spark involvement.
"""

from __future__ import annotations

from typing import NamedTuple


class YamlLocation(NamedTuple):
    line: int
    column: int


def _split_key(content: str) -> tuple[str, int, bool, bool] | None:
    """Parse a ``key: value`` line fragment.

    Returns ``(key, key_offset, has_value, is_block_scalar)`` or None if
    the fragment is not a mapping entry.  The colon search is aware of
    single/double quotes so ``"a:b": x`` parses as key ``"a:b"``.
    """
    in_single = in_double = False
    colon = -1
    for i, ch in enumerate(content):
        if ch == "'" and not in_double:
            in_single = not in_single
        elif ch == '"' and not in_single:
            in_double = not in_double
        elif ch == ":" and not in_single and not in_double:
            colon = i
            break
    if colon < 0:
        return None
    key_part = content[:colon]
    key = key_part.strip()
    if not key:
        return None
    key_offset = len(key_part) - len(key_part.lstrip())
    rest = content[colon + 1:].strip()
    return key, key_offset, bool(rest), rest[:1] in ("|", ">")


class YamlLocator:
    """Index of YAML paths to source locations (built once per text)."""

    def __init__(self, source: str):
        self._locations: dict[str, YamlLocation] = {}
        self._build(source)

    def location_for(self, path: str | None) -> YamlLocation | None:
        if path is None:
            return None
        return self._locations.get(path)

    def location_for_nearest(self, path: str | None) -> YamlLocation | None:
        """Location of ``path`` or its closest recorded ancestor.

        Warning paths can point inside inline flow collections
        (``mappings[0].expr[1].filter[0]``), which the index resolves
        only to the owning key — walk up one component at a time
        (``.key`` or ``[i]`` alike) until a recorded position is found.
        """
        import re
        while path:
            loc = self._locations.get(path)
            if loc is not None:
                return loc
            trimmed = re.sub(r"(\.[^.\[\]]+|\[\d+\])$", "", path)
            if trimmed == path:
                return None
            path = trimmed
        return None

    def _record(self, path: str, line: int, column: int) -> None:
        self._locations.setdefault(path, YamlLocation(line, column))

    def _build(self, source: str) -> None:
        # (indent, path) scope stack; root scope has the empty path
        scopes: list[tuple[int, str]] = [(0, "")]
        seq_index: dict[str, int] = {}

        for lineno, raw in enumerate(source.splitlines(), start=1):
            stripped = raw.strip()
            if not stripped or stripped.startswith("#"):
                continue
            indent = len(raw) - len(raw.lstrip(" "))
            content = raw[indent:]

            if content.startswith("-"):
                while len(scopes) > 1 and scopes[-1][0] >= indent:
                    scopes.pop()
                parent = scopes[-1][1]
                if not parent:
                    continue
                idx = seq_index.get(parent, 0)
                seq_index[parent] = idx + 1
                item_path = f"{parent}[{idx}]"
                self._record(item_path, lineno, indent + 1)
                scopes.append((indent, item_path))

                # `- key: ...` — the item's first key sits on the dash line
                after_dash = content[1:]
                inline = after_dash.lstrip()
                offset = 1 + (len(after_dash) - len(inline))
                parsed = _split_key(inline)
                if parsed:
                    key, key_offset, has_value, is_block = parsed
                    full = f"{item_path}.{key}"
                    self._record(full, lineno,
                                 indent + offset + key_offset + 1)
                    if not has_value or is_block:
                        scopes.append((indent + offset, full))
                continue

            while len(scopes) > 1 and scopes[-1][0] >= indent:
                scopes.pop()
            parsed = _split_key(content)
            if parsed:
                key, key_offset, has_value, is_block = parsed
                parent = scopes[-1][1]
                full = f"{parent}.{key}" if parent else key
                self._record(full, lineno, indent + key_offset + 1)
                if not has_value or is_block:
                    scopes.append((indent, full))
