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


def parse_path(path: str, *, allow_index: bool = True,
               error_code: str = "invalid_path") -> list[PathToken]:
    """Tokenize a dot path into Key/Index tokens."""
    tokens: list[PathToken] = []
    i, n = 0, len(path)
    if n == 0:
        return tokens
    expect_segment = True
    while i < n:
        c = path[i]
        if c == ".":
            if expect_segment:
                raise RuleError(error_code, f"empty path segment in {path!r}")
            i += 1
            expect_segment = True
            continue
        if c == "[":
            if expect_segment and not tokens:
                # a path may not start with an index/quoted key per the
                # reference tokenizer, but quoted keys at start are fine
                pass
            j = i + 1
            if j < n and path[j] in "\"'":
                quote = path[j]
                j += 1
                buf = []
                while j < n:
                    ch = path[j]
                    if ch == "\\":
                        if j + 1 >= n or path[j + 1] not in ("\\", '"', "'"):
                            raise RuleError(error_code,
                                            f"invalid escape in path {path!r}")
                        buf.append(path[j + 1])
                        j += 2
                        continue
                    if ch == quote:
                        break
                    if ch in "[]":
                        raise RuleError(
                            error_code,
                            f"brackets not allowed inside quoted key: {path!r}")
                    buf.append(ch)
                    j += 1
                else:
                    raise RuleError(error_code, f"unterminated quote in {path!r}")
                if j + 1 >= n or path[j + 1] != "]":
                    raise RuleError(error_code, f"missing ] in path {path!r}")
                tokens.append(Key("".join(buf)))
                i = j + 2
                expect_segment = False
                continue
            # numeric index
            j = i + 1
            num = []
            while j < n and path[j].isdigit():
                num.append(path[j])
                j += 1
            if not num or j >= n or path[j] != "]":
                raise RuleError(error_code, f"invalid index in path {path!r}")
            if not allow_index:
                raise RuleError(error_code,
                                f"array indexes not allowed in {path!r}")
            tokens.append(Index(int("".join(num))))
            i = j + 1
            expect_segment = False
            continue
        # plain key segment
        j = i
        buf = []
        while j < n and path[j] not in ".[":
            if path[j] == "]":
                raise RuleError(error_code, f"unexpected ] in path {path!r}")
            buf.append(path[j])
            j += 1
        if not buf:
            raise RuleError(error_code, f"empty path segment in {path!r}")
        tokens.append(Key("".join(buf)))
        i = j
        expect_segment = False
    if expect_segment:
        raise RuleError(error_code, f"trailing dot in path {path!r}")
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
