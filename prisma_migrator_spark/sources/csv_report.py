"""CSV report sink with Excel formula cells (SURVEY §2.1 S9).

⇐ ``getAppsStats`` / ``getCategoriesStats`` (reference
src/utils/lib.ts:498-554): result rows flattened, ``=HYPERLINK``
formula cells built with quote escaping, field order taken from the
schema (R2 — DataFrame schemas are ordered, so that's free), one CSV
file written.

``coalesce(1)`` mirrors the reference's single-file spreadsheet
output; it is a *report* sink (small, human-facing), not a data sink —
large outputs should keep the default partitioned layout
(``single_file=False``).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame


def write_csv_report(
    df: DataFrame, path: str, single_file: bool = True, header: bool = True
) -> str:
    """Write ``df`` as CSV. With ``single_file``, produce exactly
    ``path`` (a file); else ``path`` is a directory of parts."""
    if not single_file:
        df.write.mode("overwrite").option("header", header).option(
            "quoteAll", True
        ).csv(path)
        return path
    tmp = path + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").option("header", header).option(
        "quoteAll", True
    ).csv(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    if os.path.exists(path):
        os.remove(path)
    shutil.move(part, path)
    shutil.rmtree(tmp, ignore_errors=True)
    return path
