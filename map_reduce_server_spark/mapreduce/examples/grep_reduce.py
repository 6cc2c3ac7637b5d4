#!/usr/bin/env python3
"""Grep reducer: drop the synthetic key, print the line.

Same contract as the reference's grep reducer
(``tests/testdata/exec/grep_reduce.py:14-27``).
"""
import sys

for line in sys.stdin:
    line = line.rstrip("\n")
    parts = line.split("\t", 1)
    if len(parts) == 2:
        sys.stdout.write(parts[1] + "\n")
