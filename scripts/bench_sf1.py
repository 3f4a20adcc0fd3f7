"""sf1 scale datapoint for the three LSH self-joins + the composed v2
pipeline (r4 verdict "Next round" #8): one bracketed run at 10x bench
scale to confirm candidate-set growth and hot-bucket drop rates stay
bounded on organic-shaped data (the caps were previously exercised
only on synthetic hot buckets).

The sf1 tables are synthesized DETERMINISTICALLY from the driver's
sf0.1 parquet (no external data): 10 replicas with disjoint id ranges.
Replica r > 0 applies a bijective per-replica character rotation to
the text (a-z rotated by r) — a char bijection maps shingle sets
bijectively, so every within-replica Jaccard (char or word gram) is
EXACTLY preserved while cross-replica overlap collapses to noise.
The result is the honest 10x scale-up shape: organic duplicate
structure per replica, corpus x10, true near-dup pairs x10 (linear,
not quadratic). Embeddings rotate their dimensions by r (pairwise
cosine within a replica preserved; cross-replica scrambled).

Usage: python scripts/bench_sf1.py [reps]
Writes the sf1 parquet to /tmp/spark_graft_sf1/ (regenerated if
missing) and prints a markdown table + one compact JSON line.
"""

from __future__ import annotations

import json
import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from json_schema_spark.operators.dedup import hot_bucket_stats  # noqa: E402
from json_schema_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/spark_graft_sf1"
REPLICAS = 10
QUERIES = [
    ("minhash_neardup_documents", "minhash_lsh"),
    ("ngram_jaccard_documents", "ngram_prefix"),
    ("embedding_neardup_pairs", "embedding_lsh"),
    ("prepare_training_data_v2", None),
]


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(f"{SF1}/documents.parquet") and \
            os.path.exists(f"{SF1}/embeddings.parquet"):
        return
    os.makedirs(SF1, exist_ok=True)
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    parts = []
    for r in range(REPLICAS):
        rot = lower[r:] + lower[:r]
        rot_u = upper[r:] + upper[:r]
        t = F.col("text") if r == 0 else \
            F.translate(F.col("text"), lower + upper, rot + rot_u)
        parts.append(docs.select(
            (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
            t.alias("text"), "lang", "source", "n_chars"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite") \
        .parquet(f"{SF1}/documents.parquet")

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    dim = len(emb.select("embedding").first()["embedding"])
    parts = []
    for r in range(REPLICAS):
        e = F.col("embedding") if r == 0 else F.concat(
            F.slice(F.col("embedding"), r + 1, dim - r),
            F.slice(F.col("embedding"), 1, r))
        parts.append(emb.select(
            (F.col("vec_id") + r * 10_000_000).alias("vec_id"),
            e.alias("embedding"), "label"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite") \
        .parquet(f"{SF1}/embeddings.parquet")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark(app="bench_sf1", cores=32)
    build_sf1(spark)
    qs = E.queries()

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    results: dict[str, dict] = {}
    for name, op in QUERIES:
        row: dict = {}
        for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            times = []
            n_rows = None
            for _ in range(reps):
                t0 = time.perf_counter()
                mat(qs[name](spark, sf_dir))
                times.append(round(time.perf_counter() - t0, 3))
            n_rows = qs[name](spark, sf_dir).count()
            row[label] = {"best": min(times), "times": times, "rows": n_rows}
            if op:
                row[label]["drops"] = hot_bucket_stats(op, timeout=5.0)
        row["scale_factor_wall"] = round(
            row["sf1"]["best"] / max(row["sf0.1"]["best"], 1e-9), 2)
        results[name] = row

    print("\n| query | sf0.1 best | sf1 best | wall x | sf0.1 rows | "
          "sf1 rows | sf1 drops |")
    print("|---|---|---|---|---|---|---|")
    for name, r in results.items():
        d = r["sf1"].get("drops")
        ds = (f"{d['dropped_buckets']} buckets / "
              f"{d['dropped_member_rows']} rows (cap {d['cap']})"
              if d else "—")
        print(f"| {name} | {r['sf0.1']['best']} s | {r['sf1']['best']} s "
              f"| {r['scale_factor_wall']}x | {r['sf0.1']['rows']} "
              f"| {r['sf1']['rows']} | {ds} |")
    print(json.dumps({"metric": "bench_sf1", "results": results},
                     separators=(",", ":"), default=str))
    spark.stop()


if __name__ == "__main__":
    main()
