#!/usr/bin/env python
"""Regenerate the per-query driver-verification ledger in COVERAGE.md.

Round-4 VERDICT ask #8: surface cumulative driver coverage — one column per
registered query saying which round last produced a fully-green driver row
(rows + schema + value-hash in a committed ``CORRECTNESS_r*.json``), so
evidence gaps are self-auditing instead of requiring the judge to re-derive
them from the artifacts.

Rewrites the block between the ``driver-ledger`` markers (appends the
section on first run).  Run from the repo root after each round's artifact
lands:

    python tools/gen_coverage_ledger.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
START = "<!-- driver-ledger:start -->"
END = "<!-- driver-ledger:end -->"


def collect() -> tuple[dict[str, int], dict[str, int], list[str]]:
    """(last fully-green round, last weak-green round, registry order).

    Fully green = rows + schema + hash all true.  Weak = rows + schema true
    but hash false/absent (rows-only checks land here too).
    """
    import __spark_entry__ as entry

    names = list(entry.queries())
    full: dict[str, int] = {}
    weak: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(path))
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict) or row.get("err") not in (None, ""):
                continue
            if not (row.get("rows_match") and row.get("schema_match")):
                continue
            if row.get("hash_match"):
                full[name] = max(full.get(name, -1), rnd)
            else:
                weak[name] = max(weak.get(name, -1), rnd)
    return full, weak, names


def render(full: dict[str, int], weak: dict[str, int], names: list[str]) -> str:
    n_full = sum(1 for n in names if n in full)
    n_weak = sum(1 for n in names if n not in full and n in weak)
    n_never = len(names) - n_full - n_weak
    by_round: dict[str, list[str]] = {}
    for n in names:
        if n in full:
            key = f"r{full[n]}"
        elif n in weak:
            key = f"r{weak[n]} (weak: rows+schema only)"
        else:
            key = "never"
        by_round.setdefault(key, []).append(n)

    lines = [
        START,
        "## Driver-verification ledger (cumulative, auto-generated)",
        "",
        "Regenerate with `python tools/gen_coverage_ledger.py` after each",
        "round's `CORRECTNESS_r*.json` lands.  \"rN\" = the most recent round",
        "whose committed driver artifact has a fully-green row (rows + schema",
        "+ value-hash) for that query.",
        "",
        f"**{n_full}/{len(names)} fully driver-green** ({n_weak} weak, "
        f"{n_never} never driver-verified).",
        "",
        "| last green | n | queries |",
        "|---|---|---|",
    ]

    def round_key(k: str) -> tuple[int, int]:
        if k == "never":
            return (1, 0)
        m = re.match(r"r(\d+)", k)
        return (0, -int(m.group(1)))

    for key in sorted(by_round, key=round_key):
        qs = by_round[key]
        lines.append(f"| {key} | {len(qs)} | {', '.join(f'`{q}`' for q in qs)} |")
    lines += ["", END]
    return "\n".join(lines)


def main() -> int:
    full, weak, names = collect()
    block = render(full, weak, names)
    path = os.path.join(REPO, "COVERAGE.md")
    text = open(path).read()
    if START in text and END in text:
        pre = text[: text.index(START)]
        post = text[text.index(END) + len(END) :]
        text = pre + block + post
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    open(path, "w").write(text)
    n_full = sum(1 for n in names if n in full)
    print(f"ledger: {n_full}/{len(names)} fully green; written to COVERAGE.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
