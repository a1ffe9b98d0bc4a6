"""Dot-path parsing shared by sources, refs, targets and JSON ops.

Grammar follows the reference's path tokenizer
(``crates/rulemorph/src/path.rs``; spec ``docs/rules_spec_en.md:149-154``):

- dot-separated object keys: ``user.profile.name``
- array indexes in brackets: ``items[0].id``, ``matrix[1][0]``
- bracket-quoted keys for keys containing dots: ``user["profile.name"]``
  (inside quotes only ``\\\\`` and ``\\"``/``\\'`` escapes; ``[``/``]`` forbidden)
"""

from __future__ import annotations

from dataclasses import dataclass

from .errors import RuleError


@dataclass(frozen=True)
class Key:
    name: str


@dataclass(frozen=True)
class Index:
    index: int


PathToken = Key | Index


_U64_MAX = 18446744073709551615


def parse_path(path: str, *, allow_index: bool = True,
               error_code: str = "invalid_path") -> list[PathToken]:
    """Tokenize a dot path into Key/Index tokens.

    Mirrors ``path.rs:28-120`` exactly (round-7 path-parity): the
    reference's four error wordings (``path is empty`` / ``path
    segment is empty`` / ``path syntax is invalid`` / ``path escape is
    invalid``), ``]`` allowed inside bare keys, empty quoted keys
    rejected, ASCII-only saturating u64 indexes."""
    def err(msg: str) -> RuleError:
        return RuleError(error_code, msg)

    def parse_bracket(i: int):
        # i at '['
        j = i + 1
        if j >= n:
            raise err("path syntax is invalid")
        c = path[j]
        if c in ('"', "'"):
            quote = c
            j += 1
            buf: list[str] = []
            closed = False
            while j < n:
                ch = path[j]
                if ch == "\\":
                    j += 1
                    if j >= n or path[j] not in ("\\", quote):
                        raise err("path escape is invalid")
                    buf.append(path[j])
                    j += 1
                    continue
                if ch == "[" or ch == "]":
                    raise err("path syntax is invalid")
                if ch == quote:
                    j += 1
                    closed = True
                    break
                buf.append(ch)
                j += 1
            key = "".join(buf)
            if key == "":
                raise err("path segment is empty")
            if not closed:
                raise err("path syntax is invalid")
            if j >= n or path[j] != "]":
                raise err("path syntax is invalid")
            return Key(key), j + 1
        if c.isascii() and c.isdigit():
            value = 0
            has_digit = False
            while j < n and path[j].isascii() and path[j].isdigit():
                has_digit = True
                value = min(value * 10 + int(path[j]), _U64_MAX)
                j += 1
            if not has_digit or j >= n or path[j] != "]":
                raise err("path syntax is invalid")
            if not allow_index:
                raise err(f"array indexes not allowed in {path!r}")
            return Index(value), j + 1
        raise err("path syntax is invalid")

    tokens: list[PathToken] = []
    i, n = 0, len(path)
    if n == 0:
        return tokens
    while i < n:
        if path[i] == ".":
            raise err("path segment is empty")
        if path[i] == "[":
            tok, i = parse_bracket(i)
            tokens.append(tok)
        else:
            start = i
            # bare keys stop ONLY at '.' and '[' — ']' is a plain char
            while i < n and path[i] != "." and path[i] != "[":
                i += 1
            tokens.append(Key(path[start:i]))
        while i < n and path[i] == "[":
            tok, i = parse_bracket(i)
            tokens.append(tok)
        if i < n:
            if path[i] == ".":
                i += 1
                if i == n:
                    raise err("path syntax is invalid")
            else:
                raise err("path syntax is invalid")
    return tokens


def get_path(value, tokens: list[PathToken]):
    """Navigate a plain-Python JSON value; returns (found, value)."""
    cur = value
    for tok in tokens:
        if isinstance(tok, Key):
            if isinstance(cur, dict) and tok.name in cur:
                cur = cur[tok.name]
            else:
                return False, None
        else:
            if isinstance(cur, list) and 0 <= tok.index < len(cur):
                cur = cur[tok.index]
            else:
                return False, None
    return True, cur
