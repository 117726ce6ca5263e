from prisma_migrator_spark.sources.csv_report import write_csv_report  # noqa: F401
