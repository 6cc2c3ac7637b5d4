#!/usr/bin/env python3
"""Grep reducer: drop the synthetic key, print the line.

Same observable contract as the reference's grep reducer
(``tests/testdata/exec/grep_reduce.py:14-27``): the line is
whitespace-stripped and must split into exactly two tab-separated
fields, otherwise it is skipped.
"""
import sys

for line in sys.stdin:
    parts = line.strip().split("\t")
    if len(parts) == 2:
        sys.stdout.write(parts[1] + "\n")
