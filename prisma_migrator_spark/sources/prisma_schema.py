"""Prisma schema (.prisma DSL) parsing → Spark schemas.

The reference's S3 surface: ``loadSchema`` reads a schema.prisma file
and ``getModels`` enumerates its model names through Prisma's DMMF
(reference src/migrate.ts:19-30); the model list drives the per-table
migration loop. This module is the Spark-native equivalent — a parser
for the public Prisma schema language that yields model names AND
their ``StructType``s, so a migration can enumerate tables from the
same artifact the reference deployment already maintains (the
Parquet-footer / JDBC-metadata introspection in :mod:`catalog` and
:mod:`sources.jdbc` remains the default when no schema file exists).

Scope: model blocks, enum blocks, scalar field types, optional ``?``
and list ``[]`` markers. Relation fields (whose type names another
model, or that carry ``@relation``) describe foreign keys, not stored
columns scanned by ``findMany`` — they are skipped, matching what a
row scan of the underlying table returns. ``datasource`` /
``generator`` blocks and attributes are ignored.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

#: Prisma scalar → Spark type (Json kept as its JSON text; Decimal at
#: Prisma's documented default precision).
SCALAR_TYPES: dict[str, T.DataType] = {
    "String": T.StringType(),
    "Boolean": T.BooleanType(),
    "Int": T.IntegerType(),
    "BigInt": T.LongType(),
    "Float": T.DoubleType(),
    "Decimal": T.DecimalType(38, 18),
    "DateTime": T.TimestampType(),
    "Json": T.StringType(),
    "Bytes": T.BinaryType(),
}

_BLOCK_RE = re.compile(
    r"^[ \t]*(model|enum)\s+(\w+)\s*\{(.*?)^[ \t]*\}",
    re.MULTILINE | re.DOTALL,
)
_FIELD_RE = re.compile(r"^\s*(\w+)\s+(\w+)(\[\])?(\?)?(.*)$")


def load_schema(path: str) -> str:
    """Read a schema file, with the reference's explicit error shape
    (src/migrate.ts:19-25)."""
    try:
        with open(path, encoding="utf-8") as f:
            return f.read()
    except OSError as e:
        raise ValueError(f'Cannot read schema at "{path}": {e}') from e


def _strip_comments(text: str) -> str:
    return re.sub(r"//[^\n]*", "", text)


def parse_prisma_schema(text: str) -> dict[str, T.StructType]:
    """Model name → ``StructType``. Enum-typed fields map to strings;
    relation fields (model-typed or ``@relation``-attributed) are
    skipped; ``?`` marks nullable (Prisma semantics: fields are
    required unless ``?``); ``[]`` wraps in ``ArrayType``."""
    text = _strip_comments(text)
    blocks = _BLOCK_RE.findall(text)
    model_names = {name for kind, name, _ in blocks if kind == "model"}
    enum_names = {name for kind, name, _ in blocks if kind == "enum"}

    schemas: dict[str, T.StructType] = {}
    for kind, name, body in blocks:
        if kind != "model":
            continue
        fields: list[T.StructField] = []
        for line in body.splitlines():
            m = _FIELD_RE.match(line)
            if not m:
                continue
            fname, ftype, is_list, is_opt, rest = m.groups()
            if ftype in model_names or "@relation" in rest:
                continue  # relation, not a stored column
            if ftype in enum_names:
                spark_type: T.DataType = T.StringType()
            elif ftype in SCALAR_TYPES:
                spark_type = SCALAR_TYPES[ftype]
            elif ftype == "Unsupported":
                continue
            else:
                raise ValueError(
                    f"model {name}: unknown type {ftype!r} for field {fname!r}"
                )
            if is_list:
                spark_type = T.ArrayType(spark_type, containsNull=False)
            fields.append(
                T.StructField(fname, spark_type, nullable=bool(is_opt))
            )
        schemas[name] = T.StructType(fields)
    return schemas


def list_models(text: str) -> list[str]:
    """Model names in declaration order — the reference's
    ``getModels`` (src/migrate.ts:27-30), driving the per-table
    migration loop."""
    text = _strip_comments(text)
    return [n for kind, n, _ in _BLOCK_RE.findall(text) if kind == "model"]
