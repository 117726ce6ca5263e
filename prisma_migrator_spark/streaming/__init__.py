from prisma_migrator_spark.streaming.windows import (  # noqa: F401
    session_windows,
    sliding_windows,
    tumbling_windows,
)
