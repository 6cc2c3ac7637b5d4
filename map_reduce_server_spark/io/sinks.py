"""Sinks.

Parity shim for the reference's output finalize step
(``master/__main__.py:448-467``): reducer outputs are copied to the
user's output directory and renamed ``outputfile01..NN``. On Spark we
write with the normal distributed text writer and rename the
``part-*`` files on the driver — a metadata-only operation however
large the data is.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame


def write_numbered_text(df: DataFrame, output_dir: str) -> list[str]:
    """Write a single-string-column DataFrame as text files named
    ``outputfile{NN}`` (one per partition), returning the paths."""
    staging = os.path.join(output_dir, "_staging")
    df.write.mode("overwrite").text(staging)
    os.makedirs(output_dir, exist_ok=True)
    parts = sorted(glob.glob(os.path.join(staging, "part-*")))
    out_paths = []
    for i, part in enumerate(parts):
        dest = os.path.join(output_dir, f"outputfile{i + 1:02d}")
        shutil.move(part, dest)
        out_paths.append(dest)
    shutil.rmtree(staging, ignore_errors=True)
    return out_paths
