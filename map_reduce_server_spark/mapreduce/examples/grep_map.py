#!/usr/bin/env python3
"""Grep mapper: keep lines containing the query substring
(case-insensitive), emit ``1<TAB>line``.

Same observable contract as the reference's grep mapper
(``tests/testdata/exec/grep_map.py:20-28``): the line is
whitespace-stripped and blank lines are skipped before matching.
The query defaults to 'join' here (the synthetic corpus's frequent
token) and can be overridden via argv[1].
"""
import sys

query = sys.argv[1].lower() if len(sys.argv) > 1 else "join"
for line in sys.stdin:
    line = line.strip()
    if not line:
        continue
    if query in line.lower():
        sys.stdout.write(f"1\t{line}\n")
