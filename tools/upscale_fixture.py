"""Upscale the sf0.1 fixtures ~10x into a scratch sf1 directory for the
scaling probe (SCALE.md "sf0.1 -> sf1 wall-time exponents").

Growth model — facts x10, dims fixed (the realistic "more transactions /
more documents" axis, and the one that stresses fact shuffles):

- lineitem / orders: 10 copies with consistently shifted order keys, so
  every join still resolves and per-order row counts are preserved;
  customer/part/supplier keys are reused (10x the activity per entity).
- documents: 10 copies with shifted doc_ids; each copy deterministically
  remaps ~1/3 of its word vocabulary (suffix tagged with the copy index),
  so intra-copy near-duplicate structure is preserved while CROSS-copy
  shingle overlap drops below any LSH threshold — the duplicate density
  stays sf0.1-like instead of every doc gaining 9 exact twins (which
  would measure skew-cap behavior, not scaling).
- embeddings: 10 copies with shifted vec_ids; each copy rolls the vector
  elements by the copy index (norm- and distribution-preserving, so IVF
  cells repopulate naturally instead of collapsing into 10-point stacks).
- events: 10 copies with shifted event_ids (kept for completeness).
- dims (region nation customer supplier part): copied as-is.

Everything is a Spark job over the source parquet — no driver-side rows.

Usage: python tools/upscale_fixture.py [src_dir] [dst_dir] [factor]
Defaults: /root/testdata/sf0.1 -> /tmp/spark_graft_sf1, factor 10.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ytsaurus_spark.session import get_spark


def upscale(src: str, dst: str, factor: int = 10) -> None:
    spark = get_spark("upscale-fixture")
    os.makedirs(dst, exist_ok=True)
    copies = spark.range(factor).select(F.col("id").cast("int").alias("__c"))

    def fan(df):
        return df.crossJoin(F.broadcast(copies))

    rd = lambda t: spark.read.parquet(os.path.join(src, f"{t}.parquet"))
    wr = lambda df, t: df.write.mode("overwrite").parquet(
        os.path.join(dst, f"{t}.parquet")
    )

    for t in ("region", "nation", "customer", "supplier", "part"):
        wr(rd(t), t)

    okey_span = rd("orders").agg(F.max("o_orderkey")).collect()[0][0] + 1
    wr(
        fan(rd("orders")).withColumn(
            "o_orderkey", F.col("o_orderkey") + F.col("__c") * okey_span
        ).drop("__c"),
        "orders",
    )
    wr(
        fan(rd("lineitem")).withColumn(
            "l_orderkey", F.col("l_orderkey") + F.col("__c") * okey_span
        ).drop("__c"),
        "lineitem",
    )

    ev_span = rd("events").agg(F.max("event_id")).collect()[0][0] + 1
    wr(
        fan(rd("events")).withColumn(
            "event_id", F.col("event_id") + F.col("__c") * ev_span
        ).drop("__c"),
        "events",
    )

    doc_span = rd("documents").agg(F.max("doc_id")).collect()[0][0] + 1
    # remap ~1/3 of each copy's words: token w -> w + "q<c>" when
    # xxhash64(w) % 3 == 0 (copy 0 keeps the original text, so sf0.1 is a
    # strict subset and per-copy duplicate structure is IDENTICAL)
    docs = fan(rd("documents")).withColumn(
        "doc_id", F.col("doc_id") + F.col("__c") * doc_span
    )
    toks = F.split(F.col("text"), " ")
    remapped = F.array_join(
        F.transform(
            toks,
            lambda w: F.when(
                (F.col("__c") > 0) & (F.pmod(F.xxhash64(w), F.lit(3)) == 0),
                F.concat(w, F.lit("q"), F.col("__c").cast("string")),
            ).otherwise(w),
        ),
        " ",
    )
    wr(
        docs.withColumn("text", remapped)
        .withColumn("n_chars", F.length("text").cast("int"))
        .drop("__c"),
        "documents",
    )

    vec_span = rd("embeddings").agg(F.max("vec_id")).collect()[0][0] + 1
    emb = fan(rd("embeddings")).withColumn(
        "vec_id", F.col("vec_id") + F.col("__c") * vec_span
    )
    dim = len(rd("embeddings").select("embedding").first()[0])
    rolled = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.element_at(
            F.col("embedding"),
            (F.pmod(i + F.col("__c"), F.lit(dim)) + 1).cast("int"),
        ),
    )
    wr(emb.withColumn("embedding", rolled).drop("__c"), "embeddings")

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        n = spark.read.parquet(os.path.join(dst, f"{t}.parquet")).count()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    upscale(src, dst, factor)
