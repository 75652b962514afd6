"""Training-corpus curation operators: sequence packing, benchmark
contamination checks, PII scrubbing, stratified sampling, repetition
detection, and domain-mixture weighting.

These are the operations a 100 TB LLM-data pipeline runs after dedup
(operators/dedup.py) and quality scoring (operators/text.py). Everything is
built from JVM-side expressions and equi-joins; the only global ordering
(sequence packing) uses the two-phase prefix-sum pattern instead of a
single-partition window, so every operator keeps all executors busy at
1000-node scale.

Reference parity note: the reference expresses such pipelines as chained
MapReduce operations over static tables (run_map_reduce,
yt/python/yt/wrapper/run_operation_commands.py:142); here each pipeline
stage is a declarative DataFrame plan that Catalyst fuses and AQE re-splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# A deterministic per-row hash in [0, 100) that DuckDB reproduces exactly:
# first 4 hex chars of md5 of the stringified id. Used for sampling so the
# "same rows on re-run" guarantee holds across engines and cluster sizes
# (the reference's deterministic sampling: sampling_rate with a fixed seed,
# yt/yt/ytlib/scheduler/config.h:349-361).
def _hash_bucket(col, buckets: int = 100):
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10)
            .cast("long") % buckets)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    block: int = 4096,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out in id
    order, token counts accumulate, and each document is assigned to the
    training window (bin) its first token lands in.

    Scale shape: a naive ``sum() OVER (ORDER BY id)`` collapses to ONE
    partition. Instead, a two-phase prefix sum over explicit id blocks
    (``__blk = id div block``): cumsum *within* each block via a window
    partitioned on ``__blk`` — its hash exchange is the ONLY shuffle the
    data takes — plus broadcast per-block prefix offsets from a
    column-pruned pre-pass (partial-agg'd map-side, tiny). Using a
    derived block key instead of ``spark_partition_id()`` keeps the window
    partitioning aligned with a deterministic key (no second exchange to
    re-bucket physical partitions) and makes the layout independent of
    cluster size. Assumes roughly-dense ids (sparse ids skew block sizes
    but never break correctness).
    """
    toks = F.ceil(F.length(text_col) / 4).cast("long")
    base = docs.select(
        F.col(id_col),
        toks.alias("__tok"),
        (F.col(id_col) / block).cast("long").alias("__blk"),
    )
    per_blk = base.groupBy("__blk").agg(F.sum("__tok").alias("__bsum"))
    offsets = per_blk.select(
        "__blk",
        (F.sum("__bsum").over(Window.orderBy("__blk")) - F.col("__bsum")).alias(
            "__off"
        ),
    )
    w = Window.partitionBy("__blk").orderBy(id_col)
    packed = (
        base.join(F.broadcast(offsets), "__blk")
        .withColumn("__cum", F.sum("__tok").over(w) + F.col("__off"))
        .withColumn(
            "bin_id", F.floor((F.col("__cum") - F.col("__tok")) / budget)
        )
    )
    return packed.select(id_col, "__tok", "bin_id")


def pack_bins_summary(packed: DataFrame, budget: int) -> DataFrame:
    """Per-bin fill statistics for a pack_sequences layout."""
    return (
        packed.groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__tok").cast("long").alias("tokens"),
        )
        .withColumn("fill", F.round(F.col("tokens") / budget, 4))
    )


def shingle_set(docs: DataFrame, k: int, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Distinct word k-gram shingles per document (short docs fall back to
    the whole text as a single shingle). One scan, no Python."""
    t = F.split(F.col(text_col), " ")
    shingles = F.when(
        F.size(t) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - k),
            lambda i: F.array_join(F.slice(t, i + 1, k), " "),
        ),
    ).otherwise(F.array(F.array_join(t, " ")))
    return (
        docs.select(F.col(id_col), F.explode(F.array_distinct(shingles)).alias("s"))
    )


def contamination_check(
    train: DataFrame,
    benchmark: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination scan: training docs sharing any word k-gram
    with a benchmark/eval set, with the overlap count.

    Scale shape: inverted-index equi-join on the shingle string. The
    benchmark side (eval suites, ~thousands of docs) is tiny relative to a
    100 TB corpus, so its distinct-shingle set broadcasts; the train side
    streams through one scan + one local dedup. No all-pairs comparison.
    """
    bench_sh = shingle_set(benchmark, k, id_col, text_col).select("s").distinct()
    train_sh = shingle_set(train, k, id_col, text_col)
    return (
        train_sh.join(F.broadcast(bench_sh), "s")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


# PII patterns are deliberately minimal + engine-portable (RE2 and Java
# regex agree on this subset): emails, NNN-NNNN phone tails, 6+ digit runs.
PII_PATTERNS = [
    ("[a-z0-9._]+@[a-z0-9]+\\.[a-z]+", "<EMAIL>"),
    ("[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("[0-9]{6,}", "<NUM>"),
]


def pii_scrub(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Redact PII-shaped spans, keeping a per-doc redaction count. The
    count is computed from regexp_extract_all *before* replacement so
    overlapping pattern classes are counted once per class, in order."""
    out = docs
    scrubbed = F.col(text_col)
    n_red = F.lit(0).cast("long")
    for pat, repl in PII_PATTERNS:
        n_red = n_red + F.size(F.regexp_extract_all(scrubbed, F.lit(pat), F.lit(0)))
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return out.select(
        F.col(id_col),
        n_red.alias("n_redactions"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, int],
    default_rate: int = 100,
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its id-hash
    bucket (0..99) falls below the stratum's percentage rate.

    Scale shape: the rate table is a literal CASE expression — no join, no
    shuffle; the filter is evaluated inside the scan stage and re-runs
    byte-identically on any cluster size.
    """
    rate = F.lit(default_rate)
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == k, v).otherwise(rate)
    return docs.filter(_hash_bucket(F.col(id_col)) < rate)


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Intra-document repetition: highest single-token share of the doc.

    Token histogram per doc via explode + two aggregations (both partial-
    agg'd map-side); no window, no Python. Degenerate repeated-phrase docs
    surface with top_ratio → 1.
    """
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    per_tok = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_tok.groupBy(id_col)
        .agg(
            F.max("c").cast("long").alias("top_count"),
            F.sum("c").cast("long").alias("n_tokens"),
        )
        .withColumn("top_ratio", F.round(F.col("top_count") / F.col("n_tokens"), 4))
    )


def train_mix_weights(
    docs: DataFrame,
    stratum_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Domain-mixture reweighting: per-stratum token mass and the sampling
    weight that equalizes the mixture (target = uniform share). One
    aggregation + a broadcast scalar; the weight column feeds
    stratified_sample / weighted loaders downstream."""
    per = docs.groupBy(stratum_col).agg(
        F.sum(F.ceil(F.length(text_col) / 4)).cast("long").alias("tokens")
    )
    total = per.agg(
        F.sum("tokens").alias("t"), F.count(F.lit(1)).alias("k")
    )
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            stratum_col,
            "tokens",
            F.round((F.col("t") / F.col("k")) / F.col("tokens"), 6).alias("weight"),
        )
    )


def global_shuffle(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic global shuffle for training order: sort by
    md5(id) — a pseudorandom permutation that is reproducible across
    engines, re-runs, and cluster sizes (no seed state, no driver RNG).
    At scale this is ONE range shuffle (repartitionByRange semantics of a
    global sort), the standard way to decorrelate a 100 TB corpus before
    sharding into training files."""
    return docs.withColumn("__shuffle_key", F.md5(F.col(id_col).cast("string"))).orderBy(
        "__shuffle_key"
    )


def length_buckets(
    docs: DataFrame,
    n_buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-bucketed batching: docs grouped into ``n_buckets`` quantile
    buckets of estimated token length, so batches pad to similar lengths
    (the throughput trick sequence-packing doesn't cover for
    padded-batch trainers). ntile over a single narrow sort — the sorted
    column is the token count, so the shuffle moves (id, tokens) only."""
    from pyspark.sql import Window

    toks = F.ceil(F.length(text_col) / 4).cast("long")
    w = Window.orderBy(toks.asc(), F.col(id_col).asc())
    return docs.select(
        F.col(id_col),
        toks.alias("est_tokens"),
        F.ntile(n_buckets).over(w).alias("bucket"),
    )
