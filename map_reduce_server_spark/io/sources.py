"""Sources.

The reference's one source is "directory of line-oriented text
files" (reference ``master/__main__.py:288-289`` lists and sorts the
directory; workers stream lines, ``worker/__main__.py:109-117``).
The MapReduce façade ingests that layout with ``os.listdir`` + raw
``open()`` in the map task (``mapreduce/job._mapped_lines``), which
is exact reference parity. ``read_text_dir`` below is the
RELATIONAL-side convenience source with Hadoop scan semantics —
useful when the text dir feeds DataFrame operators, with the
documented Hadoop caveats; parquet/csv/json come free via
``spark.read`` and are exercised in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_dir(spark: SparkSession, input_dir: str) -> DataFrame:
    """Read a directory of text files → DataFrame[file, value].

    ``file`` is the source file name (not full path), so per-file
    accounting (counts, provenance joins) is possible downstream.

    Hadoop scan semantics apply — this is NOT the façade's
    listdir-parity ingestion (that is ``mapreduce/job``): hidden
    (``_``/``.``-prefixed) files are silently skipped, a filename
    containing ``,`` or glob metacharacters is resolved as
    pattern syntax, and 0-byte files yield no rows. Feed those
    layouts through ``mapreduce.run_job`` instead.
    """
    # input_file_name() returns a percent-ENCODED URI: decode the
    # basename or 'my file.txt' comes back as 'my%20file.txt' and
    # never matches an os.listdir-derived name. url_decode follows
    # java.net.URLDecoder and turns a literal '+' into a space —
    # but '+' is a legal, never-encoded URI path character (a file
    # named 'a+b.txt' must stay 'a+b.txt'), so protect it first
    # (the inverse of the URI encoding, like urllib's unquote).
    basename = F.element_at(F.split(F.input_file_name(), "/"), -1)
    return spark.read.text(input_dir).select(
        F.url_decode(
            F.regexp_replace(basename, r"\+", "%2B")
        ).alias("file"),
        F.col("value"),
    )
