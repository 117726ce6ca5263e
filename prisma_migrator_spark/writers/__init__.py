from prisma_migrator_spark.writers.upsert import (  # noqa: F401
    append_skip_duplicates,
    upsert_parquet,
    write_entity,
)
