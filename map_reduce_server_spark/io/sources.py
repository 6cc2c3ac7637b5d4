"""Sources.

The reference's one source is "directory of line-oriented text
files" (reference ``master/__main__.py:288-289`` lists and sorts the
directory; workers stream lines, ``worker/__main__.py:109-117``).
Here that's ``spark.read.text`` + ``input_file_name()`` so file
provenance survives into the plan; parquet/csv/json come free via
``spark.read`` and are exercised in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_dir(spark: SparkSession, input_dir: str) -> DataFrame:
    """Read a directory of text files → DataFrame[file, value].

    ``file`` is the source file name (not full path), matching the
    reference's per-file task accounting (SURVEY.md §2.A#1).
    """
    # input_file_name() returns a percent-ENCODED URI: decode the
    # basename or 'my file.txt' comes back as 'my%20file.txt' and
    # never matches an os.listdir-derived name. url_decode follows
    # java.net.URLDecoder and turns a literal '+' into a space —
    # but '+' is a legal, never-encoded URI path character (a file
    # named 'a+b.txt' must stay 'a+b.txt'), so protect it first
    # (same contract as job.py's unquote(urlparse(uri).path)).
    basename = F.element_at(F.split(F.input_file_name(), "/"), -1)
    return spark.read.text(input_dir).select(
        F.url_decode(
            F.regexp_replace(basename, r"\+", "%2B")
        ).alias("file"),
        F.col("value"),
    )
