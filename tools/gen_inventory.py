#!/usr/bin/env python3
"""Regenerate SURVEY.md §2.4's gate-row inventory table from the Q(...)
registries in src/main/scala/graft.

Usage: python3 tools/gen_inventory.py [--write]

Without --write, prints the table to stdout (diff it by eye or pipe).
With --write, replaces the table block in SURVEY.md in place (the rows
between the `| Gate row | ... |` header and the first non-table line).

Parsing rules:
  - a row starts at `Q("q...`, capturing file:line;
  - the registration is read to its BALANCED closing paren (string
    literals skipped), then split into top-level arguments, so a
    registration spanning any number of lines or carrying extra None
    arguments cannot be misread;
  - oracle = "rows + check row" when the third argument (Q's `oracle`)
    is literally None, "DuckDB hash" otherwise;
  - headline = "no" when a top-level `headline = false` argument is
    present.
"""
import re
import sys
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "src", "main", "scala", "graft")
SURVEY = os.path.join(ROOT, "SURVEY.md")


def top_level_args(text, open_paren):
    """Split the argument list of the call whose '(' is at `open_paren`
    into top-level (depth-1) arguments, skipping string literals; returns
    None if the paren never balances (truncated file)."""
    args, cur, depth, i, in_str = [], [], 1, open_paren + 1, False
    while i < len(text):
        c = text[i]
        if in_str:
            if c == "\\":
                cur.append(text[i:i + 2])
                i += 2
                continue
            if c == '"':
                in_str = False
        elif c == '"':
            in_str = True
        elif c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
            if depth == 0:
                args.append("".join(cur).strip())
                return args
        elif c == "," and depth == 1:
            args.append("".join(cur).strip())
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    return None


def scan():
    rows = {}
    for dirpath, _, files in os.walk(SRC):
        for fn in files:
            if not fn.endswith(".scala"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, SRC)
            with open(path) as f:
                text = f.read()
            for m in re.finditer(r'Q\("((?:q_|q\d)[A-Za-z0-9_]*)"', text):
                name = m.group(1)
                line_no = text.count("\n", 0, m.start()) + 1
                args = top_level_args(text, text.index("(", m.start()))
                if args is None or len(args) < 3:
                    print(f"WARN unparseable Q registration {name} at "
                          f"{rel}:{line_no}", file=sys.stderr)
                    continue
                # Q(name, run, oracle, headline = true): the ORACLE verdict
                # is anchored to the third positional argument, headline to
                # an explicit named argument — immune to extra None/false
                # tokens elsewhere in the registration
                oracle = "rows + check row" if args[2] == "None" \
                    else "DuckDB hash"
                headline = "no" if any(
                    re.fullmatch(r"headline\s*=\s*false", a) for a in args
                ) else "yes"
                rows[name] = (f"{rel}:{line_no}", oracle, headline)
    return rows


def table(rows):
    out = ["| Gate row | Where | Oracle | Headline |", "|---|---|---|---|"]
    for name in sorted(rows):
        where, oracle, headline = rows[name]
        out.append(f"| {name} | `{where}` | {oracle} | {headline} |")
    return "\n".join(out)


def check_23(rows):
    """Cross-check SURVEY §2.3/§2.3.1 against the registry: every q-token
    mentioned there must be a real gate row (no stale names), and every
    gate row must be mentioned at least once (no uninventoried
    capability). Returns the number of violations."""
    with open(SURVEY) as f:
        text = f.read()
    s23 = text[text.index("### 2.3 "):text.index("### 2.4 ")]
    mentioned = set(re.findall(r"\bq(?:_[a-z0-9_]+|\d+_[a-z0-9_]+)\b", s23))
    bad = 0
    for name in sorted(mentioned - set(rows)):
        print(f"CHECK FAIL: §2.3 mentions '{name}' which is not a gate row")
        bad += 1
    for name in sorted(set(rows) - mentioned):
        print(f"CHECK FAIL: gate row '{name}' is missing from §2.3.1's inventory")
        bad += 1
    if bad == 0:
        print(f"check OK: {len(mentioned)} §2.3 names == {len(rows)} gate rows")
    return bad


def main():
    rows = scan()
    if "--check" in sys.argv:
        sys.exit(1 if check_23(rows) else 0)
    t = table(rows)
    if "--write" not in sys.argv:
        print(t)
        print(f"-- {len(rows)} gate rows", file=sys.stderr)
        return
    with open(SURVEY) as f:
        text = f.read()
    start = text.index("| Gate row | Where | Oracle | Headline |")
    end = start
    for line in text[start:].splitlines(keepends=True):
        if line.startswith("|"):
            end += len(line)
        else:
            break
    with open(SURVEY, "w") as f:
        f.write(text[:start] + t + "\n" + text[end:])
    print(f"wrote {len(rows)} rows to SURVEY.md")


if __name__ == "__main__":
    main()
