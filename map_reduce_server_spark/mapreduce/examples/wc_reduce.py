#!/usr/bin/env python3
"""Wordcount reducer: count runs of identical lines in sorted input.

Same contract as the reference's reducer (``wc_reduce.sh:14``,
``cut -f1 | uniq -c`` over sorted ``word<TAB>1`` lines): input lines
with the same key arrive consecutively; output ``word<TAB>total``.
"""
import sys

prev = None
count = 0
for line in sys.stdin:
    line = line.rstrip("\n")
    if line != prev:
        if prev is not None:
            sys.stdout.write(f"{prev.split(chr(9))[0]}\t{count}\n")
        prev = line
        count = 0
    count += 1
if prev is not None:
    sys.stdout.write(f"{prev.split(chr(9))[0]}\t{count}\n")
