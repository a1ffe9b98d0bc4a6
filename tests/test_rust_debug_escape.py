"""Rust ``{:?}`` string rendering: the engine's ``rust_str_debug``
(errors.py) and the interpreter's independent ``_rust_str_debug``
(interp.py) must agree over the FULL BMP plus astral samples, and both
must reproduce Rust's documented Debug-for-str behavior — in
particular grapheme-extend escaping (``escape_debug_ext`` with
``escape_grapheme_extended: true``, core/src/fmt/mod.rs): combining
marks would otherwise visually glue to the opening quote.
"""

from __future__ import annotations

import sys

import pytest

from rulemorph_spark.errors import rust_str_debug
from rulemorph_spark.interp import _rust_str_debug


def test_engine_and_interp_agree_over_full_bmp():
    # every BMP scalar value (surrogates excluded — not valid chars)
    for cp in range(0, 0x10000):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        ch = chr(cp)
        assert rust_str_debug(ch) == _rust_str_debug(ch), hex(cp)


@pytest.mark.parametrize("cp", [
    0x10000, 0x1133E, 0x11357, 0x1D165, 0x1D16E, 0x1D172, 0x1D173,
    0x1F389, 0x1F3FB, 0xE0020, 0xE007F, 0xE0100, 0x10FFFF])
def test_engine_and_interp_agree_astral(cp):
    ch = chr(cp)
    assert rust_str_debug(ch) == _rust_str_debug(ch), hex(cp)


# concrete pins of Rust's format!("{:?}", s) output
@pytest.mark.parametrize("s,expected", [
    ("abc", '"abc"'),
    ('say "hi"\n', '"say \\"hi\\"\\n"'),
    ("tab\there", '"tab\\there"'),
    ("é", '"é"'),                       # precomposed: printable, verbatim
    ("é", '"e\\u{301}"'),         # combining acute: grapheme-extend
    ("́", '"\\u{301}"'),           # lone combining mark
    ("a⃠", '"a\\u{20e0}"'),        # Me: COMBINING ENCLOSING CIRCLE...
    ("का", '"का"'),           # Mc spacing mark: NOT extend, verbatim
    ("া", '"\\u{9be}"'),           # Other_Grapheme_Extend (Mc!)
    ("ﾞ", '"\\u{ff9e}"'),          # Other_Grapheme_Extend (Lm!)
    ("‌", '"\\u{200c}"'),          # ZWNJ (Cf + OGE)
    ("‍", '"\\u{200d}"'),          # ZWJ (Cf)
    ("\x7f", '"\\u{7f}"'),              # DEL (Cc)
    (" ", '" "'),             # NBSP (Zs): printable, verbatim
    ("🎉", '"🎉"'),                      # astral emoji: printable
    ("🎉́", '"🎉\\u{301}"'),
    ("\U000E0041", '"\\u{e0041}"'),     # tag char (Cf + OGE)
    ("〮", '"\\u{302e}"'),          # HANGUL TONE MARK (Mc + OGE)
])
def test_rust_debug_pins(s, expected):
    assert rust_str_debug(s) == expected
    assert _rust_str_debug(s) == expected
