"""SimHash near-duplicate fingerprinting, expression-only.

64-bit SimHash: hash each word to 64 bits; per document, each bit
position accumulates +1/−1 by whether the word-hash has that bit set;
the fingerprint's bit i is 1 iff the accumulated weight is positive.
Near-dups = fingerprints within a small Hamming distance.

Implementation is one groupBy(doc) collecting word hashes, then a pure
array expression computes all 64 bit-sums — a single shuffle whose
payload is one bigint per word. Pair search blocks on 16-bit chunks of
the fingerprint (a Hamming-≤3 pair must agree exactly on ≥1 of 4
chunks — pigeonhole), so the self-join is keyed, never cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cap_chunk_buckets(chunks: DataFrame, max_bucket: int | None) -> DataFrame:
    """Drop (chunk_idx, chunk) buckets with more than ``max_bucket``
    rows before a self-join — same occupancy cap as
    llm/minhash.py candidate_pairs. A bucket of n docs yields n²/2
    pairs, so one boilerplate fingerprint slice (empty docs, shared
    headers hashing to the same byte) can make the candidate join
    quadratic at corpus scale; the cap bounds the fan-out. A pair
    inside a dropped bucket is still found if it agrees on any other
    (un-dropped) slice, so recall loss is confined to pairs whose
    every shared slice is boilerplate-degenerate. ``None`` disables.
    """
    if max_bucket is None:
        return chunks
    w = Window.partitionBy("chunk_idx", "chunk")
    return (
        chunks.withColumn("_bn", F.count(F.lit(1)).over(w))
        .filter(F.col("_bn") <= max_bucket)
        .drop("_bn")
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash) — 64-bit fingerprint as a bigint.

    The 64 per-bit ±1 sums are plain conditional SUM aggregates over
    the exploded (doc, word-hash) relation: one groupBy(doc) shuffle
    whose payload is 64 longs per doc, all whole-stage codegen with
    map-side partial aggregation. (An earlier version collected the
    hash list per doc and folded it with 64 `F.aggregate` HOF lambdas
    — interpreted per element, measured ~3× slower at sf0.1, the same
    anti-pattern the rp-LSH signature pass had.) Integer sums are
    order-exact, so fingerprints are deterministic at any parallelism.
    """
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"),
    )
    hashed = words.select(id_col, F.xxhash64("word").alias("h"))
    aggs = [
        F.sum(
            F.when(
                F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    per_doc = hashed.groupBy(id_col).agg(*aggs)
    fp = F.lit(0).cast("long")
    for i in range(64):
        fp = fp + F.when(
            F.col(f"b{i}") > 0,
            F.lit(1).cast("long") * (2**i if i < 63 else -(2**63)),
        ).otherwise(0)
    return per_doc.select(id_col, fp.alias("simhash"))


def _chunk(col, i: int, chunk_bits: int = 16):
    return F.shiftrightunsigned(col, i * chunk_bits).bitwiseAND(
        F.lit((1 << chunk_bits) - 1)
    )


def hamming(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def _chunked(fp: DataFrame, id_col: str, chunk_bits: int) -> DataFrame:
    """One row per (doc, chunk): the fingerprint split into 64/chunk_bits
    equal bit slices. By pigeonhole, two fingerprints within Hamming
    distance (64/chunk_bits − 1) agree exactly on ≥1 slice, so a
    self-join keyed on (chunk_idx, chunk) finds every such pair without
    a cartesian product. chunk_bits is the recall/cost knob: narrower
    slices catch larger Hamming radii but make bigger join buckets.
    """
    n_chunks = 64 // chunk_bits
    return fp.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("chunk_idx"),
                    _chunk(F.col("simhash"), i, chunk_bits).alias("chunk"),
                )
                for i in range(n_chunks)
            ])
        ).alias("c"),
    ).select(
        id_col,
        "simhash",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.chunk").alias("chunk"),
    )


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    chunk_bits: int = 16,
    max_bucket: int | None = 200,
) -> DataFrame:
    """Near-dup pairs (doc_a < doc_b, hamming ≤ max_hamming).

    Complete (finds every qualifying pair) only while
    max_hamming < 64/chunk_bits; beyond that the blocking can miss a
    pair whose differing bits spread across every slice. Slices with
    more than ``max_bucket`` occupants are dropped before the
    self-join (see _cap_chunk_buckets).
    """
    chunks = _cap_chunk_buckets(
        _chunked(simhash(df, id_col, text_col), id_col, chunk_bits), max_bucket
    )
    a = chunks.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sh_a"), "chunk_idx", "chunk"
    )
    b = chunks.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sh_b"), "chunk_idx", "chunk"
    )
    return (
        a.join(b, ["chunk_idx", "chunk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming(F.col("sh_a"), F.col("sh_b")).alias("hamming"))
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_bits: int = 8,
    max_bucket: int | None = 200,
) -> DataFrame:
    """Distinct (doc_a, doc_b) agreeing on ≥1 fingerprint slice —
    simhash as the candidate generator for an exact verify stage
    (8-bit slices ⇒ complete for Hamming ≤ 7 while every shared slice
    stays under ``max_bucket`` occupants; over-full slices are dropped
    before the self-join, see _cap_chunk_buckets)."""
    # cache: both self-join branches read the chunked fingerprints —
    # uncached, the whole fingerprint aggregation runs twice (the
    # minhash_near_dups cache pattern; harnesses clear caches per op)
    chunks = _cap_chunk_buckets(
        _chunked(simhash(df, id_col, text_col), id_col, chunk_bits), max_bucket
    ).cache()
    a = chunks.select(F.col(id_col).alias("doc_a"), "chunk_idx", "chunk")
    b = chunks.select(F.col(id_col).alias("doc_b"), "chunk_idx", "chunk")
    return (
        a.join(b, ["chunk_idx", "chunk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )
