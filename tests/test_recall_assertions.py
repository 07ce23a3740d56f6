"""Standing banding-recall assertions (ADVICE r3, medium).

`stream_incremental_dedup` and `dedup_cross_source_matrix` generate
candidates via MinHash banding (32 hashes / 8 bands) plus a 200-row
band-bucket occupancy cap, but their driver oracles compute the FULL
exact 3-gram Jaccard relation. Oracle parity therefore silently
assumes perfect banding recall at the certified scale — exactly the
assumption that broke for simhash at sf0.1 in round 2, where the
failure surfaced as an opaque value-hash mismatch.

These tests make that assumption a named, diagnosable assertion at
every locally verified scale (sf0.01 and sf0.1): the exact truth
relation is recomputed independently and compared pair-by-pair against
the banded pipeline's output, so a future recall break fails HERE with
the missed (doc_a, doc_b, jaccard) triples instead of as a parity
mystery. They run in the default per-round pytest sweep.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tpc_di_etl_using_pyspark_spark.llm.minhash import shingles
from tpc_di_etl_using_pyspark_spark.plans._util import t

_SCALES = [SF_DIR]
if os.path.isdir("/root/testdata/sf0.1") and SF_DIR != "/root/testdata/sf0.1":
    _SCALES.append("/root/testdata/sf0.1")


def _exact_pairs(doc):
    """Exhaustive exact distinct-3-gram Jaccard >= 0.5 pairs (a < b),
    with the jaccard kept for failure diagnostics. Same shingles()
    gram convention as the pipelines, so a mismatch isolates BANDING
    recall, not gram-tokenization drift."""
    g = shingles(doc, "doc_id", "text", 3).dropDuplicates(
        ["doc_id", "shingle"]
    )
    sz = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = g.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = g.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.col("n_inter") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return (
        inter.join(
            sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")),
            "doc_a",
        )
        .join(
            sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")),
            "doc_b",
        )
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )


@pytest.mark.parametrize("sfd", _SCALES)
def test_stream_incremental_dedup_banding_recall(spark, sfd):
    """Banded+capped index probe finds EVERY exact new-by-corpus
    near-dup pair the exhaustive oracle defines (recall == 1.0 at this
    scale), and nothing else (exact verify => precision == 1.0)."""
    from tpc_di_etl_using_pyspark_spark.plans.streaming_ops import (
        stream_incremental_dedup,
    )

    truth_all = _exact_pairs(t(spark, sfd, "documents")).collect()
    truth = {}
    for r in truth_all:
        a_new, b_new = r.doc_a % 7 == 0, r.doc_b % 7 == 0
        if a_new and not b_new:
            truth[(r.doc_a, r.doc_b)] = r.jaccard
        elif b_new and not a_new:
            truth[(r.doc_b, r.doc_a)] = r.jaccard
    pred = {
        (r.new_id, r.corpus_id)
        for r in stream_incremental_dedup(spark, sfd).collect()
    }
    missed = {p: j for p, j in truth.items() if p not in pred}
    assert not missed, (
        f"banding recall break at {sfd}: {len(missed)}/{len(truth)} exact"
        f" pairs missed by the 32/8 banding + cap-200 index:"
        f" {sorted(missed.items())[:20]}"
    )
    extra = pred - truth.keys()
    assert not extra, f"non-truth pairs survived exact verify: {sorted(extra)[:20]}"


@pytest.mark.parametrize("sfd", _SCALES)
def test_cross_source_matrix_banding_recall(spark, sfd):
    """The minhash_near_dups generator under dedup_cross_source_matrix
    finds every exact >= 0.5 pair at this scale (the matrix aggregates
    these pairs, so pair-level recall certifies the matrix)."""
    from tpc_di_etl_using_pyspark_spark.plans.llm import minhash_near_dups

    doc = t(spark, sfd, "documents")
    truth = {
        (r.doc_a, r.doc_b): r.jaccard for r in _exact_pairs(doc).collect()
    }
    pred = {
        (r.doc_a, r.doc_b)
        for r in minhash_near_dups(
            doc, "doc_id", "text", k=3, num_hashes=32, bands=8, threshold=0.5
        ).collect()
    }
    missed = {p: j for p, j in truth.items() if p not in pred}
    assert not missed, (
        f"banding recall break at {sfd}: {len(missed)}/{len(truth)} exact"
        f" pairs missed by the 32/8 banding + cap-200 candidates:"
        f" {sorted(missed.items())[:20]}"
    )
    extra = pred - truth.keys()
    assert not extra, f"non-truth pairs survived exact verify: {sorted(extra)[:20]}"
