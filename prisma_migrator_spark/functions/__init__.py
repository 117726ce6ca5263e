from prisma_migrator_spark.functions.pg_compat import (  # noqa: F401
    coalesce_lit,
    csv_quote_escape,
    hyperlink,
    log10_1p,
    nullif,
    pg_normalize,
    to_char_mmddyyyy,
)
