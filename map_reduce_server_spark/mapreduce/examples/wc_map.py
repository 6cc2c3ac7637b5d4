#!/usr/bin/env python3
"""Wordcount mapper: lowercase, split on space/tab, emit ``token<TAB>1``.

Same observable contract as the reference's wordcount mapper
(``tests/testdata/exec/wc_map.sh:12``): empty tokens are emitted too
(the empty string is a legal key, SURVEY.md §1.2).
"""
import re
import sys

for line in sys.stdin:
    line = line.rstrip("\n")
    for token in re.split(r"[ \t]", line.lower()):
        sys.stdout.write(f"{token}\t1\n")
