#!/usr/bin/env python3
"""Regenerate SURVEY.md §2.4's gate-row inventory table from the Q(...)
registries in src/main/scala/graft.

Usage: python3 tools/gen_inventory.py [--write]

Without --write, prints the table to stdout (diff it by eye or pipe).
With --write, replaces the table block in SURVEY.md in place (the rows
between the `| Gate row | ... |` header and the first non-table line).

Parsing rules (registrations are at most a few lines):
  - a row starts at `Q("q...`, capturing file:line;
  - oracle = "DuckDB hash" when the registration carries Some(...),
    "rows + check row" when it carries None;
  - headline = "no" when `headline = false` appears before the
    registration's closing `)`.
"""
import re
import sys
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "src", "main", "scala", "graft")
SURVEY = os.path.join(ROOT, "SURVEY.md")


def scan():
    rows = {}
    for dirpath, _, files in os.walk(SRC):
        for fn in files:
            if not fn.endswith(".scala"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, SRC)
            with open(path) as f:
                lines = f.readlines()
            for i, line in enumerate(lines):
                m = re.search(r'Q\("((?:q_|q\d)[A-Za-z0-9_]*)"', line)
                if not m:
                    continue
                name = m.group(1)
                # the registration text up to its closing line (every
                # registration in the repo ends within four lines, on a
                # line closing the Q(...) call)
                blob_lines = []
                for j in range(i, min(i + 4, len(lines))):
                    blob_lines.append(lines[j])
                    if lines[j].rstrip().rstrip(",").endswith(")"):
                        break
                blob = "".join(blob_lines)
                oracle = "rows + check row" if re.search(r",\s*None", blob) \
                    else "DuckDB hash"
                headline = "no" if "headline = false" in blob else "yes"
                rows[name] = (f"{rel}:{i + 1}", oracle, headline)
    return rows


def table(rows):
    out = ["| Gate row | Where | Oracle | Headline |", "|---|---|---|---|"]
    for name in sorted(rows):
        where, oracle, headline = rows[name]
        out.append(f"| {name} | `{where}` | {oracle} | {headline} |")
    return "\n".join(out)


def main():
    rows = scan()
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
