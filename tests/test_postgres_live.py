"""LIVE Postgres round-trip for the JDBC upsert sink (SURVEY §2.1
S5-S6) — closes the one environmental gap carried since round 3.

The sandbox now ships PostgreSQL 15 server binaries (no JDBC jar and
no Python driver, so Spark's stock JDBC transport still can't run —
that transport is Spark's code, not this repo's). What IS this repo's
contract — every SQL statement the sink generates, the staging-merge
choreography, and the duplicate-key hazard ``dedupe_batch`` exists
for — is exercised here against a real ``postgres`` process:

- server runs as the unprivileged ``postgres`` user (initdb/pg_ctl
  via ``su``; PG refuses root) on a private unix socket, trust auth;
- statements execute through the stock ``psql`` client, so the sink's
  injectable ``run_sql`` seam is wired to a genuine server;
- the reference's parameter shape (``$1..$n``, src/utils/lib.ts:80)
  is validated via ``PREPARE``/``EXECUTE`` — real PG parses and binds
  the exact numbered-placeholder statement ``build_values_upsert_sql``
  emits;
- the ``ON CONFLICT DO UPDATE ... cannot affect row a second time``
  error that motivates ``dedupe_batch`` is reproduced on the real
  server, then shown fixed by the dedupe.

Skips cleanly when the server binaries or the postgres user are
absent (other sandboxes).
"""

from __future__ import annotations

import shutil
import subprocess
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import Row

from prisma_migrator_spark.writers.jdbc_sink import (
    build_values_upsert_sql,
    dedupe_batch,
    jdbc_upsert_via_staging,
)

_PG_USER_EXISTS = any(
    line.startswith("postgres:")
    for line in Path("/etc/passwd").read_text().splitlines()
)

pytestmark = pytest.mark.skipif(
    shutil.which("pg_ctl") is None
    or shutil.which("initdb") is None
    or shutil.which("psql") is None
    or not _PG_USER_EXISTS,
    reason="no live PostgreSQL server available in this sandbox",
)


def _su_pg(cmd: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["su", "-s", "/bin/sh", "postgres", "-c", cmd],
        capture_output=True,
        text=True,
    )


class _Live:
    """psql-backed executor: the sink's ``run_sql`` seam wired to a
    real server. Queries go through one psql invocation each —
    slow-path fine for a contract test."""

    def __init__(self, sock: str, db: str):
        self.sock, self.db = sock, db

    def sql(self, statement: str, check: bool = True) -> str:
        p = subprocess.run(
            [
                "psql", "-h", self.sock, "-U", "pms", "-d", self.db,
                "-X", "-v", "ON_ERROR_STOP=1", "-A", "-t", "-F", "\t",
                "-c", statement,
            ],
            capture_output=True,
            text=True,
        )
        if check and p.returncode != 0:
            raise RuntimeError(p.stderr)
        return p.stdout if check else p.stderr

    def rows(self, query: str) -> list[tuple[str, ...]]:
        out = self.sql(query).strip("\n")
        return [tuple(l.split("\t")) for l in out.splitlines() if l]


@pytest.fixture(scope="module")
def pg():
    base = Path(tempfile.mkdtemp(prefix="pms_pg_", dir="/tmp"))
    data, sock = base / "data", base / "sock"
    sock.mkdir()
    subprocess.run(["chown", "-R", "postgres:", str(base)], check=True)
    base.chmod(0o755)
    sock.chmod(0o755)
    init = _su_pg(f"initdb -D {data} -U pms -A trust")
    if init.returncode != 0:
        pytest.skip(f"initdb failed: {init.stderr[-200:]}")
    start = _su_pg(
        f"pg_ctl -D {data} -w -l {base}/log start "
        f"-o \"-k {sock} -c listen_addresses=''\""
    )
    if start.returncode != 0:
        pytest.skip(f"pg_ctl start failed: {start.stderr[-200:]}")
    try:
        yield _Live(str(sock), "postgres")
    finally:
        _su_pg(f"pg_ctl -D {data} -m immediate stop")
        subprocess.run(["rm", "-rf", str(base)])


@pytest.fixture()
def live(pg):
    pg.sql('DROP TABLE IF EXISTS "Developer"')
    pg.sql(
        'CREATE TABLE "Developer" (handle text PRIMARY KEY, '
        "name text, email text)"
    )
    pg.sql(
        "INSERT INTO \"Developer\" VALUES ('a', 'Alice', 'a@x'), "
        "('b', 'Bob', 'b@x')"
    )
    return pg


_PG_TYPES = {"string": "text", "bigint": "bigint", "int": "integer",
             "double": "double precision", "boolean": "boolean"}


def _pg_staging_writer(live: _Live):
    """Test stand-in for ``spark_jdbc_staging_writer`` (which needs
    the JDBC jar this sandbox lacks): lands the DataFrame's rows in a
    real PG staging table, same overwrite contract."""

    def lit(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(v)

    def write(df, staging):
        cols = ", ".join(
            f'"{f.name}" {_PG_TYPES[f.dataType.simpleString()]}'
            for f in df.schema.fields
        )
        live.sql(f'DROP TABLE IF EXISTS "{staging}"')
        live.sql(f'CREATE TABLE "{staging}" ({cols})')
        values = ", ".join(
            "(" + ", ".join(lit(v) for v in row) + ")"
            for row in df.collect()
        )
        if values:
            live.sql(f'INSERT INTO "{staging}" VALUES {values}')

    return write


def _dev_rows(live: _Live) -> dict[str, tuple[str, str]]:
    return {
        h: (n, e)
        for h, n, e in live.rows(
            'SELECT handle, name, email FROM "Developer" ORDER BY handle'
        )
    }


def test_staging_upsert_live_roundtrip(spark, live):
    """update + insert through the real server, then idempotency:
    running the identical batch again leaves the table unchanged."""
    batch = spark.createDataFrame(
        [
            Row(handle="a", name="Alice2", email="a2@x"),  # update
            Row(handle="c", name="Cara", email="c@x"),  # insert
        ]
    )
    for _ in range(2):
        rep = jdbc_upsert_via_staging(
            batch,
            "Developer",
            ["handle"],
            run_sql=live.sql,
            write_staging=_pg_staging_writer(live),
        )
        assert _dev_rows(live) == {
            "a": ("Alice2", "a2@x"),
            "b": ("Bob", "b@x"),
            "c": ("Cara", "c@x"),
        }
    assert "ON CONFLICT" in rep["merge_sql"]
    # staging dropped server-side
    assert live.rows(
        "SELECT 1 FROM pg_tables WHERE tablename = %s" % "'__stg_Developer'"
    ) == []


def test_skip_duplicates_live(spark, live):
    """``update_cols=[]`` → ON CONFLICT DO NOTHING on the real server
    (the reference's createMany skipDuplicates, src/migrate.ts:58)."""
    batch = spark.createDataFrame(
        [
            Row(handle="a", name="CLOBBER", email="x@x"),
            Row(handle="d", name="Dana", email="d@x"),
        ]
    )
    jdbc_upsert_via_staging(
        batch,
        "Developer",
        ["handle"],
        run_sql=live.sql,
        write_staging=_pg_staging_writer(live),
        update_cols=[],
    )
    got = _dev_rows(live)
    assert got["a"] == ("Alice", "a@x")  # existing row untouched
    assert got["d"] == ("Dana", "d@x")  # absent row appended


def test_partial_update_live(spark, live):
    """A subset ``update_cols`` updates only those columns."""
    batch = spark.createDataFrame([Row(handle="b", name="Bobby", email="no")])
    jdbc_upsert_via_staging(
        batch,
        "Developer",
        ["handle"],
        run_sql=live.sql,
        write_staging=_pg_staging_writer(live),
        update_cols=["name"],
    )
    assert _dev_rows(live)["b"] == ("Bobby", "b@x")


def test_values_placeholders_bind_on_real_pg(live):
    """The reference's ``$1..$n`` parameter numbering
    (src/utils/lib.ts:80-93) as emitted by ``build_values_upsert_sql``
    parses, binds, and upserts through PREPARE/EXECUTE on real PG."""
    sql = build_values_upsert_sql(
        "Developer",
        ["handle", "name", "email"],
        ["handle"],
        ["name", "email"],
        n_rows=2,
        placeholder="pg",
    )
    assert "$6" in sql and "$7" not in sql
    live.sql(
        "PREPARE upsert_p (text, text, text, text, text, text) AS "
        + sql
        + "; EXECUTE upsert_p ('a', 'Ann', 'ann@x', 'e', 'Eve', 'e@x')"
    )
    got = _dev_rows(live)
    assert got["a"] == ("Ann", "ann@x")
    assert got["e"] == ("Eve", "e@x")


def test_duplicate_keys_in_one_statement_raise_live(spark, live):
    """Real PG raises ``cannot affect row a second time`` when one ON
    CONFLICT statement carries a duplicate key — the exact hazard
    ``dedupe_batch`` guards (its docstring cites this error); the
    deduped merge of the same batch then succeeds."""
    err = live.sql(
        'INSERT INTO "Developer" (handle, name, email) VALUES '
        "('z', 'Z1', 'z1@x'), ('z', 'Z2', 'z2@x') "
        "ON CONFLICT (handle) DO UPDATE SET name = EXCLUDED.name",
        check=False,
    )
    assert "second time" in err
    batch = spark.createDataFrame(
        [Row(handle="z", name="Z1", email="z1@x"),
         Row(handle="z", name="Z2", email="z2@x")]
    )
    assert dedupe_batch(batch, ["handle"]).count() == 1
    jdbc_upsert_via_staging(
        batch,
        "Developer",
        ["handle"],
        run_sql=live.sql,
        write_staging=_pg_staging_writer(live),
    )
    assert _dev_rows(live)["z"] == ("Z1", "z1@x")  # min-struct pick
