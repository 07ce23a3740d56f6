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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash) — 64-bit fingerprint as a bigint."""
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"),
    )
    hashed = words.select(id_col, F.xxhash64("word").alias("h"))
    per_doc = hashed.groupBy(id_col).agg(F.collect_list("h").alias("hs"))

    def bit_weight(i: int):
        # sum over words of (+1 if bit i set else -1)
        return F.aggregate(
            "hs",
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    fp = F.lit(0).cast("long")
    for i in range(64):
        fp = fp + F.when(bit_weight(i) > 0, F.lit(1).cast("long") * (2**i if i < 63 else -(2**63))).otherwise(0)
    return per_doc.select(id_col, fp.alias("simhash"))


def _chunk(col, i: int):
    return F.shiftrightunsigned(col, i * 16).bitwiseAND(F.lit(0xFFFF))


def hamming(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs (doc_a < doc_b, hamming ≤ max_hamming)."""
    fp = simhash(df, id_col, text_col)
    chunks = fp.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("chunk_idx"), _chunk(F.col("simhash"), i).alias("chunk"))
                for i in range(4)
            ])
        ).alias("c"),
    ).select(id_col, "simhash", F.col("c.chunk_idx").alias("chunk_idx"), F.col("c.chunk").alias("chunk"))
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
