"""Round-12 pre-certification edge tests, built ONE ROUND EARLY
(round 11; the standing §7.5-r8-item-4 enumeration, fifth execution):
the 24 incoming-r12-window ops with no dedicated test anywhere in
tests/ — the sketch/histogram/pagination aggregates, the CSV
round-trip family, the recursive hierarchy, the null-safe join, the
rolling-slope/percent-of-parent windows, and the text-analysis family
— plus agg_string_concat_group, whose all-NULL-group probe here found
and fixed a real oracle divergence (Spark '' vs DuckDB NULL, the r4
array_to_string([]) class). Each op runs as the REAL registered
op+oracle pair on a hand-built hostile fixture, plus absolute pins.

Boundaries pinned:
- histogram bins: negative price → negative bin via floor; price
  exactly on a 50000 edge → the upper bin; −0.0 lands in bin 0 with
  +0.0; a NULL price is its own NULL bin in both engines;
- deterministic pagination with the ENTIRE first page tied on the
  sort key (the unique tiebreak decides WHICH rows are page 2);
- all-NULL string_agg group is '' (empty list), not NULL;
- null-safe join: the NULL bucket pairs 5 left × 2 right = 10;
- recursive hierarchy: a depth-4 chain closes transitively; an
  orphan subtree (parent key absent) is excluded, not invented;
- percent-of-parent: a year whose signed revenues cancel to exactly
  zero yields NULL shares (the guarded-denominator contract), while
  its year_pct_of_total is 0;
- rolling slope: a frame whose five rows share one ship date has zero
  x-variance → NULL (never DIVIDE_BY_ZERO);
- language-ID precedence on exact score ties (en ≥ de ≥ fr ≥ es) and
  'unknown' for zero scores; stopword ratio STRICTLY > 0.05 (exactly
  1-in-20 does not count); avg word length boundary 8.0 inclusive;
- per-week HLL merge deduplicates a user active in both weeks;
- approx_top_k exact at sub-bound cardinality incl. an EMPTY-STRING
  item and tied counts;
- class centroids: ±v vectors average to exactly zero; a zero-vector
  label stays zero; single-vector labels pass through.
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


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


TS = _ts("2024-01-15 12:00:00")

OPS = [
    "agg_collect_sorted", "agg_string_concat_group", "agg_histogram_fixed",
    "sketch_hll_partition_merge", "sketch_approx_topk",
    "sort_limit_offset", "tpcdi_dim_broker", "scan_csv_delim",
    "scan_csv_header", "vec_centroid_per_label", "sql_groupby_all",
    "sql_recursive_hierarchy", "sink_csv_quoted", "scan_recursive_glob",
    "scan_schema_evolution", "join_null_safe", "win_slope_rolling",
    "win_percent_of_parent", "text_bigram_logprob",
    "text_js_divergence_sources", "text_tokenize_counts", "text_stats",
    "text_lang_id", "text_quality_score", "text_token_count",
]


def _orders():
    # keys 0-24: one fully tied page-1 block (price 100.0) with
    # all-NULL priorities for custkey 1 (the string_agg '' pin);
    # 28-32: histogram bin edges (negative / exactly-50000 / 0 / NULL
    # / −0.0); 33-34: a 2022 whose signed revenues cancel to EXACTLY
    # zero (percent-of-parent NULL shares). Keys ≡ 0 (mod 7) feed the
    # null-safe join's NULL bucket.
    rows = [(k, 1, "OFP"[k % 3], 100.0, TS, None) for k in range(25)]
    rows += [
        (28, 2, "F", -75000.0, _ts("2023-06-01 00:00:00"), "1-URGENT"),
        (29, 2, "O", 50000.0, _ts("2023-06-02 00:00:00"), "1-URGENT"),
        (30, 3, "P", 0.0, TS, "2-HIGH"),
        (31, 3, "F", None, TS, "2-HIGH"),
        (32, 3, "O", -0.0, TS, None),
        (33, 4, "F", 1234.5, _ts("2022-03-01 00:00:00"), "5-LOW"),
        (34, 4, "O", -1234.5, _ts("2022-03-02 00:00:00"), "5-LOW"),
    ]
    # 36-43 (r12 top-up; none ≡0 mod 7, prices inside the 100.0 tie
    # block so the pagination pin is untouched): agg_collect_sorted's
    # hostile groups — custkey 5 mixes a NULL status with 'F' (both
    # engines drop the NULL from the set), custkey 6 is ALL-NULL
    # (Spark collect_set → [] → ''; DuckDB list(DISTINCT) → [NULL],
    # array_to_string skips it → ''), custkey 7 pins binary codepoint
    # sort '0' < 'B' < 'a' plus a DISTINCT-collapsed duplicate 'a'.
    rows += [
        (36, 5, None, 100.0, TS, "3-MEDIUM"),
        (37, 5, "F", 100.0, TS, None),
        (38, 6, None, 100.0, TS, None),
        (39, 7, "a", 100.0, TS, None),
        (40, 7, "B", 100.0, TS, None),
        (41, 7, "0", 100.0, TS, None),
        (43, 7, "a", 100.0, TS, None),
    ]
    return rows


def _customer():
    # hierarchy: 3 → 35 → 355 → 3557 (depth 4 via custkey div 10);
    # 777 is an orphan (parent 77 absent); 11/22 are ≡0 (mod 11) →
    # the null-safe join's right-side NULL keys; names are
    # CSV-hostile (pipe, quote, literal \N, unicode, trailing space).
    return [
        (3, "root three", 1, 100.0, "B"),
        (5, 'pipe|and"quote', 2, 200.0, "A"),
        (35, "child \\N literal", 3, -50.0, "B"),
        (355, "ünïcode kid", 4, 0.0, "A"),
        (3557, "deep leaf ", 0, 5000.0, "B"),
        (777, "orphan (no 77)", 1, 42.0, "A"),
        (11, "nullkey one", 2, 7.5, "B"),
        (22, "nullkey two", 3, 8.5, "A"),
        (4, "plain", 4, 9.0, "B"),
    ]


def _nation():
    # the CSV round-trip family's table: delimiter/quote collisions,
    # the literal backslash-N string (the \N sentinel collision the
    # lossless escaping exists for), tabs, unicode, edge whitespace
    return [
        (0, "pipe|inside", 0),
        (1, 'quo"te and, comma', 1),
        (2, "\\N", 2),
        (3, "tab\there", 3),
        (4, "ünïcode nation", 0),
        (5, " leading and trailing ", 1),
    ]


def _events():
    # types: a×5 / b×4 / c×2 / ""×1 (tied-ish counts + empty-string
    # item, cardinality far under the sketch bound so counts are
    # exact); user 1 is active in BOTH ISO weeks (the HLL merge must
    # deduplicate across the per-week partials)
    types = ["a", "a", "a", "a", "b", "b", "b", "b", "c", "c", ""]
    rows = [
        (i, _ts(f"2024-01-0{1 + i % 2} 12:00:00"), 1 + i % 3, types[i], 1.0, "{}")
        for i in range(11)
    ]
    rows.append((11, _ts("2024-01-08 12:00:00"), 1, "a", 1.0, "{}"))
    return rows


def _documents():
    # single-spaced by contract (the gram-family tokenization
    # convention); n_chars = len(text)
    texts = [
        (0, "", "xx", "s1"),
        (1, "the", "en", "s1"),
        (2, "der die the a", "de", "s1"),        # en 2 == de 2 → 'en'
        (3, "le la el los le", "fr", "s2"),      # fr 3 > es 2 → 'fr'
        (4, "dup dup dup dup", "en", "s2"),      # max repetition
        (5, "the a " + "w " * 17 + "end", "en", "s1"),   # 20 words, 2 stop
        (6, "abcdefgh", "xx", "s2"),             # avg_word_len exactly 8
        (7, "ünïcode wörds tëst", "xx", "s1"),
        (8, "el el el el el", "es", "s2"),
        (9, "the " + "word " * 18 + "tail", "en", "s1"),  # 20 words, 1 stop
    ]
    return [(i, t, lang, src, len(t)) for i, t, lang, src in texts]


def _embeddings():
    ramp = [(j - 32) / 32.0 for j in range(64)]
    emb = [
        (0, ramp, 0),                   # single-vector label
        (1, [0.5] * 64, 1),             # ±v pair → centroid exactly 0
        (2, [-0.5] * 64, 1),
        (3, [0.0] * 64, 2),             # zero-vector label
        (4, [0.0] * 64, 2),
    ]
    return [(i, [float(x) for x in v], l) for i, v, l in emb]


def _lineitem():
    # partkey 100: five rows sharing ONE ship date → every trailing
    # frame has zero x-variance → slope NULL; partkey 200: distinct
    # dates → real slopes once n ≥ 3
    rows = [
        (i, 100, 10, i, 5.0 + i, 10.0 * (i + 1), 0.1, 0.0, "N", "O", TS)
        for i in range(5)
    ]
    rows += [
        (i, 200, 11, i, 2.0, 10.0 + i, 0.0, 0.0, "R", "F",
         _ts(f"2024-02-0{i - 4} 00:00:00"))
        for i in range(5, 9)
    ]
    return rows


_TABLES = {
    "orders": (
        _orders,
        "o_orderkey:int64,o_custkey:int64,o_orderstatus:str,"
        "o_totalprice:f64,o_orderdate:ts,o_orderpriority:str",
    ),
    "customer": (
        _customer,
        "c_custkey:int64,c_name:str,c_nationkey:int32,c_acctbal:f64,"
        "c_mktsegment:str",
    ),
    "nation": (_nation, "n_nationkey:int32,n_name:str,n_regionkey:int32"),
    "events": (
        _events,
        "event_id:int64,ts:ts,user_id:int64,event_type:str,value:f64,"
        "props:str",
    ),
    "documents": (
        _documents,
        "doc_id:int64,text:str,lang:str,source:str,n_chars:int64",
    ),
    "embeddings": (_embeddings, "vec_id:int64,embedding:vec,label:int32"),
    "lineitem": (
        _lineitem,
        "l_orderkey:int64,l_partkey:int64,l_suppkey:int64,"
        "l_linenumber:int32,l_quantity:f64,l_extendedprice:f64,"
        "l_discount:f64,l_tax:f64,l_returnflag:str,l_linestatus:str,"
        "l_shipdate:ts",
    ),
}

_PA = {
    "int64": pa.int64(), "int32": pa.int32(), "str": pa.string(),
    "f64": pa.float64(), "ts": pa.timestamp("us"),
    "vec": pa.list_(pa.float32()),
}


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r12_window_edges")
    for name, (rows_fn, ddl) in _TABLES.items():
        fields = [
            pa.field(p.split(":")[0], _PA[p.split(":")[1]])
            for p in ddl.split(",")
        ]
        rows = rows_fn()
        cols = list(zip(*rows))
        table = pa.Table.from_arrays(
            [pa.array(list(c), type=f.type) for c, f in zip(cols, fields)],
            schema=pa.schema(fields),
        )
        pq.write_table(table, str(d / f"{name}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    for name in _TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{edge_dir}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("op", OPS)
def test_window_op_parity_on_hostile_fixture(spark, edge_dir, edge_duck, op):
    df = _QUERIES[op](spark, edge_dir)
    assert_parity(df, edge_duck, _ORACLES[op], op)


# ------------------------------------------------- absolute pins


def _rows(spark, op, d, keycol):
    return {
        r[keycol]: r.asDict() for r in _QUERIES[op](spark, d).collect()
    }


def test_histogram_bin_edges(spark, edge_dir):
    got = _rows(spark, "agg_histogram_fixed", edge_dir, "bin_id")
    assert got[-2]["n_orders"] == 1          # -75000 → floor(-1.5)
    assert got[-2]["bin_lo"] == -100000.0
    assert got[-1]["n_orders"] == 1          # -1234.5 → floor(-0.02…)
    assert got[1]["n_orders"] == 1           # exactly 50000 → upper bin
    # bin 0 = the 25 tied 100.0s + 0.0 + −0.0 + 1234.5 + the 7 r12
    # top-up rows (−0.0 does NOT open a separate bin:
    # floor(−0.0/50000) casts to bigint 0)
    assert got[0]["n_orders"] == 35
    assert got[None]["n_orders"] == 1        # NULL price is its own bin


def test_pagination_with_fully_tied_page(spark, edge_dir):
    rows = _QUERIES["sort_limit_offset"](spark, edge_dir).collect()
    # DESC by price: 50000, 1234.5, then the 100.0 tie block ordered
    # by key — page 2 (offset 10, limit 10) lands inside the ties
    assert [r.o_orderkey for r in rows] == [8, 9, 10, 11, 12, 13, 14, 15, 16, 17]


def test_all_null_group_is_empty_string(spark, edge_dir):
    got = _rows(spark, "agg_string_concat_group", edge_dir, "o_custkey")
    assert got[1]["priorities"] == ""        # all-NULL group: '', not NULL
    assert got[2]["priorities"] == "1-URGENT"
    assert got[4]["priorities"] == "5-LOW"


def test_collect_sorted_null_and_codepoint_order(spark, edge_dir):
    got = _rows(spark, "agg_collect_sorted", edge_dir, "o_custkey")
    assert got[5]["statuses"] == "F"         # NULL dropped from the set
    assert got[6]["statuses"] == ""          # all-NULL group: '', not NULL
    assert got[7]["statuses"] == "0,B,a"     # binary codepoint sort, deduped
    assert got[7]["n_orders"] == 4           # COUNT(*) keeps the dup row


def test_null_safe_join_null_bucket(spark, edge_dir):
    got = _rows(spark, "join_null_safe", edge_dir, "k")
    # left NULLs: orderkeys 0,7,14,21,28 (5); right NULLs: 11,22 (2)
    assert got[None]["n_pairs"] == 10


def test_recursive_hierarchy_depth_and_orphan(spark, edge_dir):
    got = _rows(spark, "sql_recursive_hierarchy", edge_dir, "emp_id")
    assert got[3557]["depth"] == 3           # 3 → 35 → 355 → 3557
    assert got[3557]["chain"] == "3/35/355/3557"
    assert 777 not in got                    # orphan subtree excluded


def test_percent_of_parent_zero_sum_year(spark, edge_dir):
    rows = _QUERIES["win_percent_of_parent"](spark, edge_dir).collect()
    y2022 = [r for r in rows if r.yr == 2022]
    assert y2022 and all(r.pct_of_year is None for r in y2022)
    assert all(r.year_pct_of_total == 0.0 for r in y2022)


def test_rolling_slope_zero_x_variance_frames(spark, edge_dir):
    rows = _QUERIES["win_slope_rolling"](spark, edge_dir).collect()
    same_date = [r for r in rows if r.l_partkey == 100]
    assert len(same_date) == 5 and all(r.slope5 is None for r in same_date)
    moving = sorted(
        (r for r in rows if r.l_partkey == 200), key=lambda r: r.l_orderkey
    )
    assert all(r.slope5 is not None for r in moving[2:])  # n >= 3, real x spread


def test_lang_id_tie_precedence_and_unknown(spark, edge_dir):
    got = _rows(spark, "text_lang_id", edge_dir, "doc_id")
    assert got[2]["lang_pred"] == "en"       # en 2 == de 2 → precedence
    assert got[3]["lang_pred"] == "fr"
    assert got[8]["lang_pred"] == "es"
    assert got[0]["lang_pred"] == "unknown"  # zero scores everywhere


def test_quality_strict_stopword_boundary(spark, edge_dir):
    got = _rows(spark, "text_quality_score", edge_dir, "doc_id")
    # doc 9: 1 stopword of 20 → ratio EXACTLY 0.05; the strict > means
    # its quality (2) is words-in-range + awl-in-range (4.9), with the
    # ratio component NOT counted despite sitting on the boundary
    assert got[9]["stopword_ratio"] == 0.05 and got[9]["quality"] == 2
    # doc 5: 2 of 20 → 0.1 > 0.05 DOES count; its awl 2.15 is out of
    # range, so quality is words + ratio = 2 — the two docs isolate
    # the two components at the same total
    assert got[5]["stopword_ratio"] == 0.1 and got[5]["quality"] == 2
    assert got[5]["avg_word_len"] == 2.15
    assert got[6]["avg_word_len"] == 8.0     # inclusive upper bound
    assert got[6]["quality"] == 1            # only the length component


def test_hll_merge_dedups_across_weeks(spark, edge_dir):
    got = _rows(spark, "sketch_hll_partition_merge", edge_dir, "event_type")
    # user 1 is active for type 'a' in both ISO weeks → counted once
    assert got["a"]["exact_users"] == 3
    assert all(r["merged_within_10pct"] for r in got.values())


def test_approx_topk_exact_with_ties_and_empty_item(spark, edge_dir):
    got = _rows(spark, "sketch_approx_topk", edge_dir, "event_type")
    assert got["a"]["n"] == 5 and got["b"]["n"] == 4
    assert got["c"]["n"] == 2 and got[""]["n"] == 1


def test_centroids_cancel_and_zero(spark, edge_dir):
    rows = _QUERIES["vec_centroid_per_label"](spark, edge_dir).collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r)
    assert all(r.m == 0.0 for r in by_label[1])   # +0.5/−0.5 cancel exactly
    assert all(r.m == 0.0 for r in by_label[2])   # zero vectors stay zero
    assert all(r.n_vecs == 1 for r in by_label[0])


def test_tokenize_handles_empty_text(spark, edge_dir):
    df = _QUERIES["text_tokenize_counts"](spark, edge_dir)
    # split('') yields [''] — the empty token must appear, not vanish
    assert df.filter("word = ''").count() >= 1
