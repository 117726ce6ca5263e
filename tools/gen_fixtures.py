"""Generate schema-compatible fixture tables at larger scale factors
for the SCALE REHEARSAL (VERDICT r3, item 1).

The driver ships read-only fixtures at sf<=0.1; every 100 TB design
argument in PERF.md was measured there. This generator produces sf1 /
sf10 (and arbitrary) fixture sets with the SAME schemas (FIXTURES.md
§B) and closely-matched distributions — key cardinality ratios, value
ranges, label skew, document vocabulary and near-dup rate — so the
headline + dedup query set can be re-run at 10x/100x rows and the
wall-time scaling CURVE measured instead of argued.

Distributions mimicked from /root/testdata/sf0.1 (profiled 2026-08-14):
  lineitem : 600k rows/sf0.1, ~4 lines/order, linenumber 1..7,
             qty 1..50, price 900..105000, ship 1995..2001, flags
             A/N/R x F/O uniform
  orders   : 150k, custkey ~uniform, status O/P/F, 5 priorities,
             totalprice 1k..500k, 1995..2001
  events   : 100k, 1.5k users, 5 types, value 0..560, 30-day span,
             props = {"k": int}
  documents: 5k, word-salad over a ~45-term vocab, 15..95 tokens,
             ~0.2% exact dups + ~2% near-dups (1-2 token edits)
  embeddings: 2k, 64-dim float32, 10 labels, cluster = center+noise

Generation is Spark-distributed (spark.range + column exprs; numpy in
mapInPandas only for text/embeddings, seeded per partition for
determinism) — the generator itself follows the 100 TB rules, so
producing sf100 on a cluster would be the same code.

Usage:
    python tools/gen_fixtures.py 1 [/root/repo/.fixtures/sf1]
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession, functions as F

NATIONS = 25
REGIONS = 5
MKTSEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["large", "hot", "blue", "old", "small", "new", "red", "cold"]
NOUNS = ["ring", "bolt", "widget", "gear", "cog", "pin", "cap", "rod"]
VOCAB = (
    "spark table join query filter scan sort group agg window stream "
    "batch merge hash key value row column line part order customer "
    "data vector big small fast slow the a".split()
)
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def _u(col, seed: int, mod: int = 1_000_000):
    """Deterministic uniform [0,1) from a key column — xxhash64 keyed
    by seed; the generator's only randomness source for relational
    columns (rerunning always produces identical tables)."""
    return (F.abs(F.xxhash64(col, F.lit(seed))) % mod) / mod


def gen(spark: SparkSession, sf: float, out: str) -> None:
    import os

    os.makedirs(out, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li_per = 4
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    def write(df, name, parts):
        df.repartition(parts).write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"  {name}: done")

    region = spark.range(REGIONS).select(
        F.col("id").cast("int").alias("r_regionkey"),
        F.concat(F.lit("Region#"), F.col("id")).alias("r_name"),
    )
    write(region, "region", 1)
    nation = spark.range(NATIONS).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("Nation#"), F.col("id")).alias("n_name"),
        (F.col("id") % REGIONS).cast("int").alias("n_regionkey"),
    )
    write(nation, "nation", 1)

    cust = spark.range(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        (F.abs(F.xxhash64("id", F.lit(11))) % NATIONS).cast("int").alias("c_nationkey"),
        F.round(_u(F.col("id"), 12) * 10000, 2).alias("c_acctbal"),
        F.element_at(
            F.array(*[F.lit(s) for s in MKTSEGS]),
            ((F.abs(F.xxhash64("id", F.lit(13))) % 5) + 1).cast("int"),
        ).alias("c_mktsegment"),
    )
    write(cust, "customer", max(1, int(8 * sf)))

    supp = spark.range(n_supp).select(
        F.col("id").alias("s_suppkey"),
        F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
        (F.abs(F.xxhash64("id", F.lit(21))) % NATIONS).cast("int").alias("s_nationkey"),
        F.round(_u(F.col("id"), 22) * 10000, 2).alias("s_acctbal"),
    )
    write(supp, "supplier", 1)

    part = spark.range(n_part).select(
        F.col("id").alias("p_partkey"),
        F.concat(
            F.element_at(F.array(*[F.lit(a) for a in ADJS]),
                         ((F.abs(F.xxhash64("id", F.lit(31))) % 8) + 1).cast("int")),
            F.lit(" "),
            F.element_at(F.array(*[F.lit(n) for n in NOUNS]),
                         ((F.abs(F.xxhash64("id", F.lit(32))) % 8) + 1).cast("int")),
        ).alias("p_name"),
        F.concat(F.lit("Brand#"),
                 ((F.abs(F.xxhash64("id", F.lit(33))) % 25) + 1)).alias("p_brand"),
        F.element_at(F.array(*[F.lit(t) for t in TYPES]),
                     ((F.abs(F.xxhash64("id", F.lit(34))) % 6) + 1).cast("int")).alias("p_type"),
        ((F.abs(F.xxhash64("id", F.lit(35))) % 50) + 1).cast("int").alias("p_size"),
        F.round(F.lit(900.0) + F.col("id") * 0.1, 2).alias("p_retailprice"),
    )
    write(part, "part", max(1, int(8 * sf)))

    base_day = F.lit("1995-01-01").cast("date")
    orders = spark.range(n_ord).select(
        F.col("id").alias("o_orderkey"),
        (F.abs(F.xxhash64("id", F.lit(41))) % n_cust).alias("o_custkey"),
        F.element_at(F.array(F.lit("O"), F.lit("P"), F.lit("F")),
                     ((F.abs(F.xxhash64("id", F.lit(42))) % 3) + 1).cast("int")).alias("o_orderstatus"),
        F.round(F.lit(1000.0) + _u(F.col("id"), 43) * 499000, 2).alias("o_totalprice"),
        F.date_add(base_day, (F.abs(F.xxhash64("id", F.lit(44))) % 2400).cast("int"))
            .cast("timestamp").alias("o_orderdate"),
        F.element_at(F.array(*[F.lit(p) for p in PRIORITIES]),
                     ((F.abs(F.xxhash64("id", F.lit(45))) % 5) + 1).cast("int")).alias("o_orderpriority"),
    )
    write(orders, "orders", max(1, int(16 * sf)))

    li = spark.range(n_ord * n_li_per).select(
        (F.col("id") / n_li_per).cast("long").alias("l_orderkey"),
        F.col("id").alias("__i"),
    ).select(
        "l_orderkey",
        (F.abs(F.xxhash64("__i", F.lit(51))) % n_part).alias("l_partkey"),
        (F.abs(F.xxhash64("__i", F.lit(52))) % n_supp).alias("l_suppkey"),
        ((F.col("__i") % n_li_per) + 1
         + (F.abs(F.xxhash64("__i", F.lit(53))) % 3)).cast("int").alias("l_linenumber"),
        ((F.abs(F.xxhash64("__i", F.lit(54))) % 50) + 1).cast("double").alias("l_quantity"),
        F.round(F.lit(900.0) + _u(F.col("__i"), 55) * 104100, 2).alias("l_extendedprice"),
        F.round((F.abs(F.xxhash64("__i", F.lit(56))) % 11) / 100.0, 2).alias("l_discount"),
        F.round((F.abs(F.xxhash64("__i", F.lit(57))) % 9) / 100.0, 2).alias("l_tax"),
        F.element_at(F.array(F.lit("A"), F.lit("N"), F.lit("R")),
                     ((F.abs(F.xxhash64("__i", F.lit(58))) % 3) + 1).cast("int")).alias("l_returnflag"),
        F.element_at(F.array(F.lit("F"), F.lit("O")),
                     ((F.abs(F.xxhash64("__i", F.lit(59))) % 2) + 1).cast("int")).alias("l_linestatus"),
        F.date_add(base_day, ((F.abs(F.xxhash64("__i", F.lit(60))) % 2400)
                              + (F.abs(F.xxhash64("__i", F.lit(61))) % 90)).cast("int"))
            .cast("timestamp").alias("l_shipdate"),
    )
    write(li, "lineitem", max(1, int(32 * sf)))

    ev_base = F.lit("2024-01-01 00:00:00").cast("timestamp")
    events = spark.range(n_ev).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.unix_micros(ev_base)
            + (F.abs(F.xxhash64("id", F.lit(71))) % (30 * 86400 * 1000000))
        ).alias("ts"),
        (F.abs(F.xxhash64("id", F.lit(72))) % n_users).alias("user_id"),
        F.element_at(F.array(*[F.lit(t) for t in EVENT_TYPES]),
                     ((F.abs(F.xxhash64("id", F.lit(73))) % 5) + 1).cast("int")).alias("event_type"),
        F.round(_u(F.col("id"), 74) * 560, 2).alias("value"),
        F.format_string('{"k": %d}',
                        (F.abs(F.xxhash64("id", F.lit(75))) % 100)).alias("props"),
    )
    write(events, "events", max(1, int(16 * sf)))

    # documents: word-salad text via mapInPandas (numpy per-partition
    # seeded) with exact-dup and near-dup injection to keep the dedup
    # workloads honest at scale
    # Vocabulary scales with corpus size (Heaps' law): a fixed tiny
    # vocab makes shingle/band collision density grow ~n^2 with corpus
    # size — measured as a 30x super-linear wall-time blow-up in the
    # pair-generation dedups at sf1 before this fix. Real corpora add
    # new terms as they grow; mimic with a Zipf-distributed long tail
    # whose size tracks sqrt(n_docs).
    n_tail = max(500, int(2000 * (n_doc / 5000) ** 0.5))

    def make_docs(batches):
        import numpy as np
        import pandas as pd

        vocab = np.array(VOCAB + [f"term{k}" for k in range(n_tail)])
        # Zipf weights: the ~30 function words stay frequent, the tail
        # follows 1/rank — df(shingle) stays bounded as n grows
        ranks = np.arange(1, len(vocab) + 1, dtype="float64")
        zipf = 1.0 / ranks
        zipf /= zipf.sum()
        for pdf in batches:
            out_rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.RandomState((1_000_003 * (i // 97) + 7) % (2**32 - 1))
                # docs sharing i//97 use the same stream head; offset by
                # i%97 draws -> deterministic per doc id
                rng.randint(0, 2**31 - 1, size=(i % 97) + 1)
                rng2 = np.random.RandomState(rng.randint(0, 2**31 - 1))
                n_tok = 15 + int(rng2.randint(0, 81))
                toks = vocab[rng2.choice(len(vocab), size=n_tok, p=zipf)]
                if i % 500 == 1 and i > 500:  # exact dup of doc i-500
                    yield_from = i - 500
                    rr = np.random.RandomState((1_000_003 * (yield_from // 97) + 7) % (2**32 - 1))
                    rr.randint(0, 2**31 - 1, size=(yield_from % 97) + 1)
                    rr2 = np.random.RandomState(rr.randint(0, 2**31 - 1))
                    m = 15 + int(rr2.randint(0, 81))
                    toks = vocab[rr2.choice(len(vocab), size=m, p=zipf)]
                elif i % 50 == 2 and i > 50:  # near dup: 2-token edit
                    src = i - 50
                    rr = np.random.RandomState((1_000_003 * (src // 97) + 7) % (2**32 - 1))
                    rr.randint(0, 2**31 - 1, size=(src % 97) + 1)
                    rr2 = np.random.RandomState(rr.randint(0, 2**31 - 1))
                    m = 15 + int(rr2.randint(0, 81))
                    toks = vocab[rr2.choice(len(vocab), size=m, p=zipf)].copy()
                    toks[0] = "edited"
                    toks[m // 2] = "slightly"
                text = " ".join(toks)
                out_rows.append(
                    {"doc_id": i, "text": text,
                     "lang": "en" if i % 20 else "de",
                     "source": f"src{i % 20}", "n_chars": len(text)}
                )
            yield pd.DataFrame(out_rows)

    docs = spark.range(n_doc).repartition(max(1, int(16 * sf))).mapInPandas(
        make_docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    write(docs, "documents", max(1, int(8 * sf)))

    # Cluster count scales with n (fixed 10 clusters -> cluster size
    # ~n/10 -> bucketized near-dup pair cost ~n^2; real embedding
    # corpora add CONTENT as they grow, not just density). label stays
    # int 0..9 (schema parity): label = cluster % 10.
    n_centers = max(10, n_emb // 200)

    def make_emb(batches):
        import numpy as np
        import pandas as pd

        centers = (
            np.random.RandomState(99).randn(n_centers, 64).astype("float32") * 0.3
        )
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.RandomState((2_000_003 + i) % (2**32 - 1))
                cluster = i % n_centers
                v = centers[cluster] + rng.randn(64).astype("float32") * 0.12
                rows.append(
                    {"vec_id": i, "embedding": v.tolist(), "label": cluster % 10}
                )
            yield pd.DataFrame(rows)

    emb = spark.range(n_emb).repartition(max(1, int(8 * sf))).mapInPandas(
        make_emb, "vec_id long, embedding array<float>, label int"
    )
    write(emb, "embeddings", max(1, int(4 * sf)))


def hub_part_ids(n_hubs: int, n_tail_parts: int) -> list[int]:
    """Hub part ids, spread across the MIDDLE of the id space.
    Placement matters for what the fixture demonstrates: an
    id-ordered (naive) triangle orientation pays Σ in·out wedge mass
    at each vertex, and a hub only carries that mass when it has both
    lower- and higher-id neighbors. Hubs at the extremes of the id
    range would be sources/sinks only and cost nothing — mid-range
    ids make the naive wedge mass land on the hubs, which is the
    blow-up the degree cap (and the degree orientation) must remove."""
    return [(h + 1) * n_tail_parts // (n_hubs + 1) for h in range(n_hubs)]


def hub_skewed_lineitem(
    spark: SparkSession,
    n_orders: int = 30_000,
    n_li_per: int = 4,
    n_hubs: int = 8,
    n_tail_parts: int = 20_000,
    hub_line_pct: int = 35,
) -> "F.DataFrame":
    """A lineitem table whose CO-PURCHASE GRAPH is hub-skewed — the
    degree profile the degree-cap triangle dial is built for
    (VERDICT r5 item 2: the shipped TPC-H-ish fixture is degree-
    HOMOGENEOUS, so the cap never had a fixture where it binds).

    Shape: ``n_hubs`` best-seller parts (:func:`hub_part_ids`, spread
    mid-id-space) together appear on ~``hub_line_pct``% of order
    lines; the remaining lines draw uniformly from ``n_tail_parts``
    long-tail parts. A hub therefore co-occurs with thousands of
    distinct partners (degree ~O(n_tail)) while a tail part lands in
    ~n_orders·lines·(1-p)/n_tail orders, i.e. degree ~tens — two
    populations separated by orders of magnitude, exactly the profile
    where dropping the hubs removes ~all of the naive Σ in·out wedge
    mass at ~zero vertex-coverage loss.

    Deterministic (xxhash64-seeded like every generator here); only
    the columns the co-purchase graph reads are non-trivial
    (l_orderkey, l_partkey) — the rest carry schema-parity filler.
    """
    hub_arr = F.array(*[F.lit(h) for h in hub_part_ids(n_hubs, n_tail_parts)])
    li = spark.range(n_orders * n_li_per).select(
        (F.col("id") / n_li_per).cast("long").alias("l_orderkey"),
        F.col("id").alias("__i"),
    )
    is_hub = (F.abs(F.xxhash64("__i", F.lit(81))) % 100) < hub_line_pct
    return li.select(
        "l_orderkey",
        F.when(
            is_hub,
            F.element_at(
                hub_arr,
                ((F.abs(F.xxhash64("__i", F.lit(82))) % n_hubs) + 1).cast("int"),
            ).cast("long"),
        )
        .otherwise(F.abs(F.xxhash64("__i", F.lit(83))) % n_tail_parts)
        .alias("l_partkey"),
        (F.abs(F.xxhash64("__i", F.lit(84))) % 100).alias("l_suppkey"),
        ((F.col("__i") % n_li_per) + 1).cast("int").alias("l_linenumber"),
        F.lit(1.0).alias("l_quantity"),
        F.lit(1000.0).alias("l_extendedprice"),
        F.lit(0.0).alias("l_discount"),
        F.lit(0.0).alias("l_tax"),
        F.lit("N").alias("l_returnflag"),
        F.lit("O").alias("l_linestatus"),
        F.lit("1995-01-01").cast("timestamp").alias("l_shipdate"),
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "hub":
        out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.fixtures/hub"
        spark = (
            SparkSession.builder.master("local[32]")
            .appName("gen-fixtures-hub")
            .config("spark.sql.shuffle.partitions", "32")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("WARN")
        import os

        os.makedirs(out, exist_ok=True)
        hub_skewed_lineitem(spark).repartition(8).write.mode("overwrite").parquet(
            f"{out}/lineitem.parquet"
        )
        spark.stop()
        print(f"GENERATED hub-skewed lineitem at {out}")
        return
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/root/repo/.fixtures/sf{sf:g}"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName(f"gen-fixtures-sf{sf:g}")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    gen(spark, sf, out)
    spark.stop()
    print(f"GENERATED sf={sf} at {out}")


if __name__ == "__main__":
    main()
