#!/usr/bin/env python
"""State-size curves for the custom stateful streaming operators
(VERDICT r5 item 7).

The TTL dedup, conversion funnel, and top-k leaderboard
(`streaming/stateful.py`) had batch-equivalence tests but no measured
state-growth bound — and at 100 TB the bounded-state claim is the
load-bearing one: an operator whose state store grows with the stream
eventually topples no matter how good the per-batch plan is.

Protocol: the sf fixture table is sliced into ``n_chunks`` equal
EVENT-TIME windows, fed chunk-by-chunk through the operator with one
``availableNow`` pass per chunk against a persistent checkpoint (the
production resume shape). After every pass we record the query's own
``stateOperators`` metrics — ``numRowsTotal`` and state-store memory —
against cumulative input rows. The claim to verify, per family:

  dedup_ttl : state tracks the TTL *horizon* (plateau), while the
              unbounded variant (dedup_raw, measured for contrast)
              grows linearly with the corpus;
  funnel    : state is ≤ 3 timestamps per DISTINCT user — plateaus at
              |users| while input keeps growing;
  topk      : state is exactly k entries per key (|event_type| keys) —
              flat from the first chunk.

Usage:
    python tools/state_bench.py <sf_dir> [n_chunks]

Prints one JSON line for SCALE_r06.json's `state_bench` family.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from prisma_migrator_spark.catalog import load_table  # noqa: E402
from prisma_migrator_spark.session import get_spark  # noqa: E402
from prisma_migrator_spark.streaming.jobs import run_to_parquet  # noqa: E402


def _state_metrics(prog: dict | None) -> dict:
    if not prog or not prog.get("stateOperators"):
        return {"state_rows": 0, "state_bytes": 0}
    op = prog["stateOperators"][0]
    return {
        "state_rows": int(op.get("numRowsTotal", 0)),
        "state_bytes": int(op.get("memoryUsedBytes", 0)),
    }


def run_family(spark, tag: str, source_df, op, n_chunks: int, work: str) -> list[dict]:
    """Feed `source_df` (must carry a `ts` timestamp column) through
    `op` in event-time-ordered chunks; return per-chunk metrics."""
    src, out, ckpt = (os.path.join(work, tag, d) for d in ("src", "out", "ckpt"))
    os.makedirs(src, exist_ok=True)
    bounds = source_df.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    lo_us, hi_us = (
        int(bounds.lo.timestamp() * 1e6),
        int(bounds.hi.timestamp() * 1e6) + 1,
    )
    step = (hi_us - lo_us + n_chunks - 1) // n_chunks
    schema = source_df.schema
    steps, cum = [], 0
    for i in range(n_chunks):
        chunk = source_df.where(
            (F.unix_micros("ts") >= lo_us + i * step)
            & (F.unix_micros("ts") < lo_us + (i + 1) * step)
        )
        n = chunk.count()
        if n == 0:
            continue
        cum += n
        chunk.repartition(4).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(schema).parquet(src)
            .withWatermark("ts", "1 hour")
        )
        prog = run_to_parquet(op(stream), out, ckpt)
        steps.append({"input_rows_cum": cum, **_state_metrics(prog)})
        print(f"  {tag}[{i}]: in={cum} {steps[-1]}", file=sys.stderr, flush=True)
    return steps


def main() -> None:
    sf_dir = sys.argv[1]
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("pms-state-bench")
    # 10+ query restarts per family against live checkpoints: push the
    # state-store maintenance thread past the test horizon (same
    # snapshot/delta-cleanup race documented in test_llm.py:688)
    spark.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "1h")

    from prisma_migrator_spark.llm.text import content_fingerprint
    from prisma_migrator_spark.streaming.stateful import (
        streaming_funnel,
        streaming_ingest_dedup,
        streaming_ingest_dedup_ttl,
        streaming_topk_per_key,
    )

    work = tempfile.mkdtemp(prefix="state_bench_")
    out: dict = {"sf_dir": sf_dir, "n_chunks": n_chunks, "families": {}}
    try:
        # documents + a synthetic 30-day event-time axis (doc_id order)
        docs = load_table(spark, sf_dir, "documents")
        n_docs = docs.count()
        docs_ts = docs.select(
            "doc_id", "text", "lang", "source",
            content_fingerprint(F.col("text")).alias("fingerprint"),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp")
                + F.make_dt_interval(
                    days=F.lit(0), hours=F.lit(0), mins=F.lit(0),
                    secs=F.col("doc_id") * (30 * 86400) / n_docs,
                )
            ).alias("ts"),
        )
        out["families"]["dedup_ttl"] = run_family(
            spark, "dedup_ttl", docs_ts,
            lambda s: streaming_ingest_dedup_ttl(s, ttl="3 days"),
            n_chunks, work,
        )
        out["families"]["dedup_raw"] = run_family(
            spark, "dedup_raw", docs_ts, streaming_ingest_dedup, n_chunks, work
        )

        events = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        out["families"]["funnel"] = run_family(
            spark, "funnel", events, streaming_funnel, n_chunks, work
        )
        out["families"]["topk"] = run_family(
            spark, "topk", events,
            lambda s: streaming_topk_per_key(s, k=3), n_chunks, work,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # plateau verdicts: last-half state growth vs input growth
    summary = {}
    for fam, steps in out["families"].items():
        if len(steps) < 4:
            continue
        mid, last = steps[len(steps) // 2], steps[-1]
        in_growth = last["input_rows_cum"] / max(1, mid["input_rows_cum"])
        st_growth = last["state_rows"] / max(1, mid["state_rows"])
        summary[fam] = {
            "final_input_rows": last["input_rows_cum"],
            "final_state_rows": last["state_rows"],
            "final_state_mb": round(last["state_bytes"] / 2**20, 2),
            "last_half_input_growth": round(in_growth, 2),
            "last_half_state_growth": round(st_growth, 2),
        }
    out["summary"] = summary
    print(json.dumps(out))


if __name__ == "__main__":
    main()
