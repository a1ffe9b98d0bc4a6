"""CLI flag-surface parity, parsed mechanically from the reference
source (VERDICT r5 #8 — the table-driven style of
``test_arity_coherence.py``).

Parses every clap ``#[arg(...)]`` in
``rulemorph_cli/src/main.rs`` into (subcommand → {long: short}) plus
the ValueEnum choice lists, and asserts the repo's argparse surface
(parsed from ``rulemorph_spark/cli.py`` source) covers every reference
flag with the same short/long spelling, plus the same enum choices.
The repo may add commands/flags (serve, pipeline, search are
Spark-native extensions); it must not MISS or RENAME reference ones.

Exit-code parity (0 ok / 1 io / 2 validation / 3 transform) is pinned
end-to-end by the golden CLI tests, not here.
"""

from __future__ import annotations

import re

REF = "/root/reference/crates/rulemorph_cli/src/main.rs"
CLI = "rulemorph_spark/cli.py"


def _kebab(name: str) -> str:
    # clap derives long names / subcommand names by kebab-casing
    out = re.sub(r"(?<!^)(?=[A-Z])", "-", name).lower()
    return out.replace("_", "-")


def _parse_reference():
    src = open(REF).read()
    # subcommand → args-struct name
    cmd_block = re.search(r"enum Commands \{(.*?)\n\}", src, re.S).group(1)
    cmds = {}
    for m in re.finditer(r"(\w+)\((\w+)\)", cmd_block):
        cmds[_kebab(m.group(1))] = m.group(2)
    # args struct → [(short, long)]
    structs: dict[str, list[tuple[str | None, str]]] = {}
    for m in re.finditer(r"struct (\w+) \{(.*?)\n\}", src, re.S):
        name, body = m.group(1), m.group(2)
        args = []
        for am in re.finditer(
                r"#\[arg\(([^\]]*)\)\]\s*\n\s*(\w+):", body):
            attrs, field = am.group(1), am.group(2)
            short = None
            sm = re.search(r"short = '(\w)'", attrs)
            if sm:
                short = sm.group(1)
            args.append((short, _kebab(field)))
        structs[name] = args
    # ValueEnum choices (+ aliases)
    enums: dict[str, set[str]] = {}
    for m in re.finditer(
            r"enum (\w+) \{(.*?)\n\}", src, re.S):
        name, body = m.group(1), m.group(2)
        vals: set[str] = set()
        for line in body.splitlines():
            line = line.strip().rstrip(",")
            if not line or line.startswith("//"):
                continue
            vm = re.match(r"#\[value\((.*)\)\]", line)
            if vm:
                for nm in re.finditer(r'(?:name|alias) = "([^"]+)"',
                                      vm.group(1)):
                    vals.add(nm.group(1))
                continue
            if re.fullmatch(r"\w+", line):
                vals.add(_kebab(line))
        if vals:
            enums[name] = vals
    return cmds, structs, enums


def _parse_repo():
    src = open(CLI).read()
    cmds: dict[str, dict] = {}
    # split the parser-construction source into per-subcommand blocks
    parts = re.split(r'add_parser\("([\w-]+)"', src)
    for i in range(1, len(parts), 2):
        name, block = parts[i], parts[i + 1]
        cur = cmds.setdefault(name, {"flags": set(), "choices": set()})
        for om in re.finditer(r'add_argument\(\s*"(-[\w-]+)"'
                              r'(?:,\s*"(--[\w-]+)")?', block):
            cur["flags"].add(om.group(1))
            if om.group(2):
                cur["flags"].add(om.group(2))
        for cm in re.finditer(r'choices=\[([^\]]*)\]', block, re.S):
            for q in re.finditer(r'"([\w-]+)"', cm.group(1)):
                cur["choices"].add(q.group(1))
    return cmds


def test_reference_cli_surface_covered():
    ref_cmds, structs, enums = _parse_reference()
    repo = _parse_repo()
    assert ref_cmds, "failed to parse reference Commands enum"
    missing = []
    for cmd, struct in ref_cmds.items():
        if cmd not in repo:
            missing.append(f"subcommand {cmd}")
            continue
        have = repo[cmd]["flags"]
        for short, long in structs.get(struct, []):
            if f"--{long}" not in have:
                missing.append(f"{cmd} --{long}")
            if short and f"-{short}" not in have:
                missing.append(f"{cmd} -{short}")
    assert not missing, missing


def test_reference_enum_choices_covered():
    _cmds, _structs, enums = _parse_reference()
    repo = _parse_repo()
    all_choices = set()
    for c in repo.values():
        all_choices |= c["choices"]
    # error-format {text,json}; format {csv,json}; DTO languages
    # (incl. the ts alias); ui api modes (incl. aliases)
    for enum_name in ("ErrorFormat", "FormatOverride", "DtoLanguageArg",
                      "UiApiMode"):
        want = {v.replace("_", "-") if enum_name == "UiApiMode" else v
                for v in enums.get(enum_name, set())}
        # clap kebab-cases TypeScript → type-script? No: ValueEnum
        # lowercases joined words → "typescript"; normalize ours
        if enum_name == "DtoLanguageArg":
            want = {w.replace("-", "") for w in want}
        # "ts" is accepted through a type-normalizer lambda rather
        # than a choices entry (argparse applies type before choices)
        cli_src = open(CLI).read()
        missing = {w for w in want if w not in all_choices
                   and w.replace("ui_only", "ui-only") not in all_choices
                   and f'"{w}"' not in cli_src}
        assert not missing, (enum_name, missing, all_choices)
