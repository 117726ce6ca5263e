"""Re-run-vs-cold contrast for the decode-once incremental modality
dedup (VERDICT r7 item 7): cold = decode + hash EVERY image and band
the full corpus; re-run = read the persisted (doc_id, phash) index,
decode ONLY the 10% delta, band index+delta, keep delta-touching
pairs. Parity of the pair sets is asserted, not assumed.

Usage: python tools/incr_modality_bench.py [sf_dir] [delta_frac]
"""
import sys, time, tempfile, os

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

from prisma_migrator_spark.llm.dedup import (
    hamming_band_pairs,
    incremental_hamming_pairs,
)
from prisma_migrator_spark.llm.multimodal import (
    attach_image_variant_payload,
    image_phash,
)
from prisma_migrator_spark.plans.llm import _sig_band_arity

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.fixtures/sf1"
DELTA_FRAC = float(sys.argv[2]) if len(sys.argv) > 2 else 0.10

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(32)
n = docs.count()
cut = int(n * (1 - DELTA_FRAC))
arity, maxham, cap = _sig_band_arity(docs)
kw = dict(id_col="doc_id", sig_col="phash", n_bits=64, band_bits=8,
          max_hamming=maxham, band_arity=arity, max_bucket=cap)
print(f"sf_dir={SF_DIR} n_docs={n} cut={cut} arity={arity} cap={cap}")

# warmup (JVM/codegen) on a tiny slice
image_phash(attach_image_variant_payload(docs.limit(64))).count()

# --- cold: decode everything, band everything ---
t0 = time.time()
cold_pairs = hamming_band_pairs(
    image_phash(attach_image_variant_payload(docs)), **kw)
cold_delta_touch = cold_pairs.where(
    (F.col("id_a") >= cut) | (F.col("id_b") >= cut))
n_cold = cold_pairs.count()
t_cold = time.time() - t0
print(f"COLD   full pairs={n_cold}  wall={t_cold:.1f}s")

# --- index build (ingest-time cost, paid once) ---
idx_dir = os.path.join(tempfile.mkdtemp(), "phash_index")
t0 = time.time()
image_phash(
    attach_image_variant_payload(docs.where(F.col("doc_id") < cut))
).write.parquet(idx_dir)
t_idx = time.time() - t0
print(f"INDEX  build (one-time ingest) wall={t_idx:.1f}s -> {idx_dir}")

# --- re-run: stored signatures + delta-only decode ---
t0 = time.time()
stored = spark.read.parquet(idx_dir)
delta_sigs = image_phash(
    attach_image_variant_payload(docs.where(F.col("doc_id") >= cut)))
incr = incremental_hamming_pairs(stored, delta_sigs, **kw)
n_incr = incr.count()
t_incr = time.time() - t0
print(f"RERUN  delta-touching pairs={n_incr}  wall={t_incr:.1f}s  "
      f"speedup={t_cold / t_incr:.1f}x")

# parity: incremental == full recompute restricted to delta-touching
# (skippable for timing-only runs at big SFs: --no-parity; the exact
# parity is pinned at sf1 and in pytest)
if "--no-parity" not in sys.argv:
    a = {(r.id_a, r.id_b) for r in cold_delta_touch.collect()}
    b = {(r.id_a, r.id_b) for r in incr.collect()}
    assert a == b, (sorted(a - b)[:5], sorted(b - a)[:5])
    print(f"PARITY exact: {len(a)} delta-touching pairs identical")
