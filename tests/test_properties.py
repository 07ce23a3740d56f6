"""Property-based tests (hypothesis) for the engine's composite
primitives — randomized inputs, first-principles checkers. These cover
the input shapes the fixed fixtures can't: duplicate effective dates,
all-delete CDC batches, disconnected graphs, single-row groups.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tpc_di_etl_using_pyspark_spark.llm.components import connected_components
from tpc_di_etl_using_pyspark_spark.tpcdi.pipeline import (
    cdc_apply,
    scd2_build,
    scd2_validate,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_actions = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),  # natural key
        st.integers(min_value=0, max_value=400),  # eff day offset (dups allowed)
        st.sampled_from(["A", "B", "C"]),  # tracked attr
    ),
    min_size=1,
    max_size=30,
)


@SETTINGS
@given(_actions)
def test_scd2_intervals_always_valid(spark, rows):
    base = datetime.date(2020, 1, 1)
    df = spark.createDataFrame(
        [
            (k, base + datetime.timedelta(days=off), attr, i)
            for i, (k, off, attr) in enumerate(rows)
        ],
        "k int, eff date, attr string, tb int",
    )
    dim = scd2_build(df, "k", "eff", ["attr"], "tb")
    assert scd2_validate(dim, "k").count() == 0
    cur = dim.filter("is_current").groupBy("k").count()
    assert cur.filter("count != 1").count() == 0
    # version count per key == action count per key
    per_key = dim.groupBy("k").agg(F.max("version").alias("mx"), F.count("*").alias("n"))
    assert per_key.filter("mx != n").count() == 0


_cdc = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=8),  # key
        st.integers(min_value=0, max_value=100),  # value
        st.sampled_from(["I", "U", "D"]),
        st.integers(min_value=1, max_value=50),  # dsn
    ),
    min_size=0,
    max_size=25,
)


@SETTINGS
@given(st.lists(st.integers(min_value=1, max_value=8), max_size=8, unique=True), _cdc)
def test_cdc_apply_matches_sequential_replay(spark, current_keys, cdc_rows):
    current = spark.createDataFrame(
        [(k, -1) for k in current_keys] or [(None, None)],
        "key int, val int",
    ).filter("key IS NOT NULL")
    cdc = spark.createDataFrame(
        [
            (k, v, fl, (dsn, i))  # (dsn, input-order) → unique total order
            for i, (k, v, fl, dsn) in enumerate(cdc_rows)
        ]
        or [(None, None, None, None)],
        "key int, val int, cdc_flag string, cdc_dsn struct<d:int,i:int>",
    ).filter("key IS NOT NULL")
    result = {
        r.key: r.val for r in cdc_apply(current, cdc, ["key"]).collect()
    }
    # replay in dsn order per key, python-side
    state = {k: -1 for k in current_keys}
    last = {}
    for i, (k, v, fl, dsn) in enumerate(cdc_rows):
        if k not in last or (dsn, i) > last[k][0]:
            last[k] = ((dsn, i), v, fl)
    for k, (_, v, fl) in last.items():
        if fl == "D":
            state.pop(k, None)
        else:
            state[k] = v
    assert result == state


_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12), st.integers(min_value=0, max_value=12)
    ),
    min_size=1,
    max_size=20,
)


@SETTINGS
@given(_edges)
def test_connected_components_matches_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.component for r in connected_components(df).collect()}
    # reference union-find
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want


_docs = st.lists(
    st.text(
        alphabet=st.sampled_from("ab c"),  # tiny vocab → dense Jaccard ties
        min_size=1,
        max_size=40,
    ),
    min_size=2,
    max_size=12,
)


@SETTINGS
@given(_docs)
def test_jaccard_verify_equals_bruteforce_with_all_pairs(spark, texts):
    """jaccard_verify fed EVERY pair must reproduce the brute-force
    exact Jaccard≥t set — this is what makes the size-ratio prefilter
    lossless by construction, and it must hold on degenerate shapes
    the fixtures don't have (empty-ish docs, identical docs, single
    shared word, whitespace runs)."""
    from tpc_di_etl_using_pyspark_spark.llm.minhash import (
        jaccard_verify,
        shingles,
    )

    rows = [(i, t if t.strip() else "x") for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingles(df, "doc_id", "text", k=2)
    ids = [r[0] for r in rows]
    all_pairs = spark.createDataFrame(
        [(a, b) for a in ids for b in ids if a < b], "doc_a long, doc_b long"
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_verify(all_pairs, sh, "doc_id", 0.5).collect()
    }

    # reference: python brute force with the same shingling
    import re

    def sh_set(t):
        words = re.split(r"\s+", t.lower())
        n = max(len(words) - 1, 1)
        return {" ".join(words[i : i + 2]) for i in range(n)}

    expect = {}
    by_id = {i: sh_set(t) for i, t in rows}
    for a in ids:
        for b in ids:
            if a < b:
                inter = len(by_id[a] & by_id[b])
                union = len(by_id[a] | by_id[b])
                j = inter / union if union else 0.0
                if j >= 0.5:
                    expect[(a, b)] = j
    assert set(got) == set(expect), (set(got) ^ set(expect), rows)
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-9


_hosts = st.text(alphabet="abcdefgh", min_size=1, max_size=8)
_paths = st.lists(
    st.text(alphabet="abc123", min_size=1, max_size=5), min_size=0, max_size=3
)


@given(
    host=_hosts,
    path=_paths,
    www=st.booleans(),
    upper=st.booleans(),
    utm=st.sampled_from([None, "utm_source=x", "utm_campaign=spring"]),
    real_param=st.sampled_from([None, "id=7", "q=abc"]),
    utm_last=st.booleans(),
    frag=st.booleans(),
)
@SETTINGS
def test_url_canonicalizer_invariant_under_decorations(
    spark, host, path, www, upper, utm, real_param, utm_last, frag
):
    """canonicalize_url must map every decorated variant of a page to
    the same canonical form as the bare page, while PRESERVING real
    query params."""
    from tpc_di_etl_using_pyspark_spark.plans.llm import canonicalize_url

    base = f"https://{host}.example.com/" + "/".join(path)
    params = [p for p in (utm, real_param) if p]
    if utm_last:
        params = params[::-1]  # exercise '&utm_...$' as well as '?utm_...&'
    decorated = base
    if www:
        decorated = decorated.replace("https://", "https://www.")
    if upper:
        decorated = decorated.upper().replace("HTTPS://", "https://")
    if params:
        decorated += "?" + "&".join(params)
    if frag:
        decorated += "#section-2"
    expected = base + (f"?{real_param}" if real_param else "")

    df = spark.createDataFrame([(decorated,)], "url string").select(
        canonicalize_url(F.col("url")).alias("c")
    )
    got = df.first().c
    assert got == expected.lower(), (decorated, got, expected)
