"""Round-9 regression defense for the rotating-in r3-certified ops
that had NO dedicated test coverage anywhere in tests/ (VERDICT r8
item 4, scope enumerated at r9 open): `agg_mad_anomaly text_ngram_topk
dedup_chunk_level sample_negative_pairs multimodal_dedup_sha
graph_label_propagation tpcdi_cdc_apply`.

Same shape as tests/test_stale_cert_edges.py: each test drives the
REAL registered op+oracle pair (both engines) on a hand-built hostile
fixture whose values sit exactly on the op's determinism edges:

- MAD = 0 (over half a user's values identical → only strictly-off
  rows flag), even-count interpolated medians, a deviation landing
  EXACTLY on the 3×MAD boundary (strict >, so NOT an anomaly), a
  single-row user, and a NULL user_id group;
- bigram-count ties exactly at the per-lang rk-10 boundary (bigram ASC
  is the only tiebreak), one-word docs (zero bigrams);
- chunk boundaries at exactly 20 / 21 words, a chunk repeated WITHIN
  one doc (n_docs stays 1 → not a dup), cross-doc shared chunks, and
  exact floor-division ppm (1-of-3 dup → 333333);
- negative sampling with anchor pools SMALLER than k (2 negatives <
  rnk 3) in the degenerate single-bucket regime (count < 40 →
  n_buckets = 1);
- sha dedup over identical texts (lowest doc_id wins), multibyte
  UTF-8 (n_bytes = utf-8 octets ≠ char count), and 1-copy rows;
- label propagation over NON-contiguous node ids (generated dst ids
  that don't exist must drop via the node join, on both engines);
- CDC apply: D deletes a current row, D for an absent key is a no-op,
  U updates in place, U inserts a new key, a NULL business key flows
  to 'U' (NULL % 10 is NULL → the CASE falls through to ELSE on both
  engines) — and untouched current rows survive byte-identical.

Fixture invariants kept: o_orderkey is unique WITHIN each status
subset ('F' current / 'O' extract may share keys — that IS the
update/delete path; duplicate keys inside 'O' would tie cdc_dsn and
make both engines' row_number nondeterministic, so they never occur);
doc_id / vec_id / c_custkey unique; documents.text single-space only
(the gram-family tokenization convention); n_chars == len(text).
"""

from __future__ import annotations

import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tpc_di_etl_using_pyspark_spark.plans.registry import all_oracles, all_queries

from .conftest import assert_parity

_QUERIES = all_queries()
_ORACLES = all_oracles()


def _ts(day, h=0):
    return datetime.datetime(2024, 1, day, h)


def _events_rows():
    rows, eid = [], 0

    def add(uid, val):
        nonlocal eid
        eid += 1
        rows.append((eid, _ts(1, eid % 24), uid, "click", val, "{}"))

    # user 1: MAD = 0 (4 of 5 identical) → only the 100.0 row flags
    for v in (10.0, 10.0, 10.0, 10.0, 100.0):
        add(1, v)
    # user 2: even count → interpolated median 2.5, mad 1.0, 0 anomalies
    for v in (1.0, 2.0, 3.0, 4.0):
        add(2, v)
    # user 3: |4.5 - 1.5| = 3.0 = EXACTLY 3×mad(1.0) → strict >, NOT an
    # anomaly on either engine
    for v in (0.0, 1.0, 2.0, 4.5):
        add(3, v)
    # user 4: single row → mad 0, dev 0, no anomaly
    add(4, 7.0)
    # NULL user: one window partition on both engines; mad 0 → 1 anomaly
    for v in (5.0, 5.0, 50.0):
        add(None, v)
    return rows


_W20 = " ".join(f"w{i}" for i in range(1, 21))  # exactly 20 words
_W21 = " ".join(f"w{i}" for i in range(1, 22))  # 21 words
_CHUNK_X = " ".join(f"cx{i}" for i in range(1, 21))
_CHUNK_Y = " ".join(f"cy{i}" for i in range(1, 21))
_CHUNK_Z = " ".join(f"cz{i}" for i in range(1, 21))


def _documents_rows():
    docs = []

    def add(text, lang, src="src1"):
        docs.append((len(docs), text, lang, src, len(text)))

    # en bigram counts: 't b'×3, 'b t'×2, then 13 distinct once-bigrams
    # tied at n=1 → rk 3..15 resolved purely by bigram ASC; the rk-10
    # cut keeps 'aa ab'..'aa ai' and drops 'aa aj'..'aa an'
    add("t b t b t b", "en")  # doc 0
    for c in "bcdefghijklmn":  # docs 1-13: once-bigrams 'aa a<c>'
        add(f"aa a{c}", "en")
    add("solo", "en")  # doc 14: one word → zero bigrams
    # fr chunk hazards
    add(_W20, "fr")  # doc 15: exactly 20 words → ONE chunk
    add(_W21, "fr")  # doc 16: 21 words → chunks [w1..w20] + [w21];
    #                  first chunk shared with doc 15 → both dup
    add(f"{_CHUNK_X} {_CHUNK_X}", "fr")  # doc 17: chunk X twice WITHIN
    #                  one doc — n_docs would be 1 if doc 18 vanished
    add(f"{_CHUNK_X} {_CHUNK_Y} {_CHUNK_Z}", "fr")  # doc 18: 1 of 3
    #                  chunks shared with doc 17 → ppm 333333 (floor)
    # de sha-dup trio (docs 19-21): identical text, lowest id wins
    for _ in range(3):
        add("dup dup dup", "de")
    # es multibyte: n_bytes (utf-8 octets) > char count; its single
    # 4-word chunk has no cross-doc twin → n_docs = 1 → NOT dup
    add("café déjà café déjà", "es")  # doc 22
    return docs


def _embeddings_rows():
    # 10 rows → n_buckets = GREATEST(10 // 20, 1) = 1 (degenerate
    # single bucket: every cross-label pair is a candidate). Labels
    # 0×8, 1×1, 2×1: each label-0 anchor has only TWO negatives
    # (< rnk 3 → both kept); the label-1/2 anchors have 9 each.
    labels = [0] * 8 + [1, 2]
    return [
        (i * 3, [0.1 * i, 0.2, 0.3, 0.4], lbl)  # sparse, non-consecutive ids
        for i, lbl in enumerate(labels)
    ]


def _customer_rows():
    # NON-contiguous ids: cnt = 8 → generated dst ∈ 1..8, but ids 5, 8
    # don't exist → those edges must drop via the dst-node join; ids
    # 10, 11 can only RECEIVE edges never generated (dst ≤ 8), so they
    # depend on the undirected reversal for any neighbors
    ids = [1, 2, 3, 4, 6, 7, 10, 11]
    return [(i, f"c{i}", 1, 0.0, "MACHINERY") for i in ids]


def _orders_rows():
    rows = []

    def add(k, ck, st, price, day=1):
        rows.append((k, ck, st, price, _ts(day), "1-URGENT"))

    # current state ('F' rows)
    add(1, 10, "F", 100.0)  # deleted: cdc key 1 carries ck 20 → 'D'
    add(2, 11, "F", 200.0)  # updated: cdc key 2 rewrites price + ck
    add(3, 12, "F", 300.0)  # untouched → must survive byte-identical
    # CDC extract ('O' rows): flag = 'D' iff o_custkey % 10 == 0
    add(1, 20, "O", 111.0)  # D → deletes current key 1
    add(2, 21, "O", 250.0)  # U → updates current key 2
    add(4, 33, "O", 400.0)  # U → inserts new key 4
    add(5, 30, "O", 500.0)  # D for a key NOT in current → no-op
    add(6, None, "O", 600.0)  # NULL ck → NULL % 10 → ELSE 'U' → insert
    add(7, 44, "O", None)  # U insert with NULL price → carried through
    # a 'P' order participates in NEITHER side
    add(8, 55, "P", 800.0)
    return rows


_SCHEMAS = {
    "events": pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    ),
    "documents": pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    ),
    "embeddings": pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    ),
    "customer": pa.schema(
        [
            ("c_custkey", pa.int64()),
            ("c_name", pa.string()),
            ("c_nationkey", pa.int32()),
            ("c_acctbal", pa.float64()),
            ("c_mktsegment", pa.string()),
        ]
    ),
    "orders": pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderstatus", pa.string()),
            ("o_totalprice", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ]
    ),
}

_ROWS = {
    "events": _events_rows,
    "documents": _documents_rows,
    "embeddings": _embeddings_rows,
    "customer": _customer_rows,
    "orders": _orders_rows,
}


@pytest.fixture(scope="module")
def r3_edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r3_window_edges")
    for name, schema in _SCHEMAS.items():
        rows = _ROWS[name]()
        cols = list(zip(*rows))
        table = pa.Table.from_arrays(
            [pa.array(list(c), type=f.type) for c, f in zip(cols, schema)],
            schema=schema,
        )
        pq.write_table(table, str(d / f"{name}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def r3_edge_duck(r3_edge_dir):
    con = duckdb.connect()
    for name in _SCHEMAS:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{r3_edge_dir}/{name}.parquet')"
        )
    yield con
    con.close()


# (op, minimum output rows — a floor so the test can't pass vacuously)
_CASES = [
    ("agg_mad_anomaly", 5),  # 5 user groups including the NULL group
    ("text_ngram_topk", 14),  # en: full rk 1..10; fr/de/es present
    ("dedup_chunk_level", 23),  # every doc has ≥1 chunk
    ("sample_negative_pairs", 20),  # 8×2 short-pool + 2×3 full anchors
    ("multimodal_dedup_sha", 21),  # 23 docs − 2 dup losers
    ("graph_label_propagation", 8),  # every node keeps a community
    ("tpcdi_cdc_apply", 5),  # keys 2, 3, 4, 6, 7 survive
]


@pytest.mark.parametrize("op,min_rows", _CASES, ids=[c[0] for c in _CASES])
def test_r3_window_op_on_hostile_fixture(op, min_rows, spark, r3_edge_dir, r3_edge_duck):
    df = _QUERIES[op](spark, r3_edge_dir)
    n = df.count()
    assert n >= min_rows, (
        f"{op}: hostile fixture produced {n} rows (< {min_rows}) — the "
        f"edge being pinned is not actually exercised"
    )
    assert_parity(df, r3_edge_duck, _ORACLES[op], op)


def test_mad_strict_boundary_and_zero_mad(spark, r3_edge_dir):
    """Absolute Spark-side expectations (cross-engine agreement is the
    parity test above): MAD=0 flags only strictly-off rows; the exact
    3×MAD boundary is NOT an anomaly; a single row never flags."""
    rows = {
        r.user_id: (r.n_events, r.med_v, r.mad_v, r.n_anomalies)
        for r in _QUERIES["agg_mad_anomaly"](spark, r3_edge_dir).collect()
    }
    assert rows[1] == (5, 10.0, 0.0, 1)
    assert rows[2] == (4, 2.5, 1.0, 0)
    assert rows[3] == (4, 1.5, 1.0, 0)  # dev 3.0 == 3×mad → strict >
    assert rows[4] == (1, 7.0, 0.0, 0)
    assert rows[None] == (3, 5.0, 0.0, 1)


def test_ngram_rk10_boundary_is_alphabetical(spark, r3_edge_dir):
    """The 13-way n=1 tie crossing the en rk-10 boundary must resolve
    by bigram ASC: 'aa ab'..'aa ai' survive, 'aa aj'..'aa an' do not."""
    en = {
        r.bigram: r.rk
        for r in _QUERIES["text_ngram_topk"](spark, r3_edge_dir).collect()
        if r.lang == "en"
    }
    assert en["t b"] == 1 and en["b t"] == 2
    assert {b for b in en if b.startswith("aa")} == {
        f"aa a{c}" for c in "bcdefghi"
    }


def test_chunk_ppm_exact_floor_division(spark, r3_edge_dir):
    """Exact dup_ppm per engineered doc: 20/21-word boundary docs share
    their first chunk (1000000 / 500000); the within-doc repeated chunk
    X is dup ONLY because doc 18 also has it; 1-of-3 → 333333 exactly
    (floor); the multibyte within-doc-only doc 22 is 0."""
    ppm = {
        r.doc_id: (r.n_chunks, r.n_dup_chunks, r.dup_ppm)
        for r in _QUERIES["dedup_chunk_level"](spark, r3_edge_dir).collect()
    }
    assert ppm[15] == (1, 1, 1000000)
    assert ppm[16] == (2, 1, 500000)
    assert ppm[17] == (2, 2, 1000000)  # both X copies dup via doc 18
    assert ppm[18] == (3, 1, 333333)
    assert ppm[22] == (1, 0, 0)
    assert ppm[19] == ppm[20] == ppm[21] == (1, 1, 1000000)


def test_negative_pairs_short_pool_kept_whole(spark, r3_edge_dir):
    """Anchors whose cross-label pool is smaller than k keep ALL of it:
    each label-0 anchor emits exactly its 2 negatives (ids 24, 27)."""
    out = {}
    for r in _QUERIES["sample_negative_pairs"](spark, r3_edge_dir).collect():
        out.setdefault(r.vec_id, set()).add(r.neg_id)
    for anchor in range(0, 24, 3):  # the 8 label-0 anchors
        assert out[anchor] == {24, 27}, (anchor, out.get(anchor))
    assert len(out[24]) == 3 and len(out[27]) == 3  # rnk ≤ 3 of 9


def test_sha_dedup_lowest_id_wins_and_byte_lengths(spark, r3_edge_dir):
    rows = {
        r.doc_id: (r.n_bytes, r.n_copies)
        for r in _QUERIES["multimodal_dedup_sha"](spark, r3_edge_dir).collect()
    }
    assert rows[19] == (11, 3)  # 'dup dup dup' trio → doc 19 wins
    assert 20 not in rows and 21 not in rows
    # 'café déjà café déjà' = 19 chars, 25 utf-8 octets (é/à 2 bytes)
    assert rows[22] == (25, 1)


def test_cdc_apply_flag_semantics(spark, r3_edge_dir):
    """D deletes key 1; U updates key 2 in place; key 3 untouched; U
    inserts keys 4/6/7 (NULL business key and NULL price carried);
    the absent-key D (5) and the 'P' order (8) contribute nothing."""
    rows = {
        r.o_orderkey: (r.o_custkey, r.o_totalprice)
        for r in _QUERIES["tpcdi_cdc_apply"](spark, r3_edge_dir).collect()
    }
    assert set(rows) == {2, 3, 4, 6, 7}
    assert rows[2] == (21, 250.0)  # updated, not the stale (11, 200.0)
    assert rows[3] == (12, 300.0)
    assert rows[4] == (33, 400.0)
    assert rows[6] == (None, 600.0)
    assert rows[7] == (44, None)
