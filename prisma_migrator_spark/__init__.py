"""prisma_migrator_spark — a PySpark-native analytics + ETL engine.

Re-implements (Spark-first, not a port) the full capability surface of the
reference `its-anas/prisma-migrator` (see SURVEY.md): generic table
migration with skip-duplicate / upsert semantics, an analytics query
library (latest-per-key dedup, weighted reciprocal-rank scoring,
min-max normalization, multi-way left-join ranking reports, dynamic
pivot, CSV reports with formula cells), plus large-scale
training-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal column plumbing, event-time windows).

Everything takes and returns ``pyspark.sql.DataFrame`` so plans stay
declarative and Catalyst-optimizable end to end.
"""

__version__ = "0.1.0"

from prisma_migrator_spark.session import get_spark  # noqa: F401
from prisma_migrator_spark.catalog import TABLES, load_table, load_tables  # noqa: F401
