"""Property-based tests (hypothesis) over the engine's pure-Python kernels —
the compiler/registry/harness layers where a structural invariant, not a
single example, is the real contract.  No SparkSession needed: these run in
milliseconds and fuzz the corners example tests miss.
"""

from __future__ import annotations

import re
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis2elastic_spark.metrics import MetricsRegistry
from kinesis2elastic_spark.operators.grok import (
    PATTERNS,
    _noncapturing,
    compile_grok,
    named_group_regex,
)

# ---------------------------------------------------------------------------
# grok compiler
# ---------------------------------------------------------------------------

# Patterns with a representative example each (used to build matching
# lines); kept to patterns whose examples are stable under concatenation
# with the separators below.
PATTERN_EXAMPLES = {
    "INT": "-42",
    "NUMBER": "3.14",
    "WORD": "hello",
    "NOTSPACE": "a/b:c",
    "USERNAME": "j.doe-1",
    "IPV4": "192.168.0.1",
    "UUID": "123e4567-e89b-12d3-a456-426614174000",
    "COMMONMAC": "aa:bb:cc:dd:ee:ff",
    "LOGLEVEL": "ERROR",
    "MONTH": "Oct",
    "MONTHDAY": "11",
    "YEAR": "2026",
    "TIME": "22:14:15",
    "HOUR": "23",
    "UNIXPATH": "/var/log/app.log",
    "TIMESTAMP_ISO8601": "2026-08-13T10:15:32Z",
    "POSINT": "4721",
}

_pattern_names = st.sampled_from(sorted(PATTERN_EXAMPLES))
# Separators must be regex-literal: grok templates ARE regexes outside
# %{} refs (so '|' would be alternation, '.' any-char, etc. — by design).
_separators = st.sampled_from([" ", " - ", ": ", ", ", "="])


@settings(max_examples=200)
@given(st.lists(st.tuples(_pattern_names, _separators), min_size=1, max_size=6))
def test_grok_compile_matches_constructed_line(parts):
    """For ANY template built from known patterns and literal separators:
    the compiled regex matches a line built from per-pattern examples, the
    field list is in template order, and each field's group captures its
    own example."""
    template = ""
    line = ""
    expected = []
    for i, (name, sep) in enumerate(parts):
        field = f"f{i}"
        template += f"%{{{name}:{field}}}{sep}"
        line += PATTERN_EXAMPLES[name] + sep
        expected.append((field, PATTERN_EXAMPLES[name]))
    compiled = compile_grok(template)
    assert [f.name for f in compiled.fields] == [f for f, _ in expected]
    m = re.search(compiled.regex, line)
    assert m, (template, line, compiled.regex)
    for f, (fname, example) in zip(compiled.fields, expected):
        assert f.name == fname
        # DATA/GREEDYDATA-style minimal matches aside, each example here is
        # fully consumed by its own pattern
        assert m.group(f.group) == example, (fname, m.group(f.group))


@settings(max_examples=100)
@given(st.sampled_from(sorted(PATTERNS)))
def test_grok_pattern_table_is_re2_safe(name):
    """Every pattern in the table compiles as plain re AND contains no
    constructs the DuckDB/RE2 oracle side rejects (lookaround, backrefs,
    possessive quantifiers)."""
    body = PATTERNS[name]
    re.compile(body)
    assert "(?=" not in body and "(?!" not in body and "(?<=" not in body
    assert not re.search(r"\\[1-9]", body), "backreference"
    assert "*+" not in body and "++" not in body


@settings(max_examples=100)
@given(st.lists(st.tuples(_pattern_names, _separators), min_size=1, max_size=5))
def test_named_group_regex_group_parity(parts):
    """The RE2 named-group re-emission preserves group count and captures
    the same substrings as the numbered form."""
    template = "".join(f"%{{{n}:f{i}}}{s}" for i, (n, s) in enumerate(parts))
    line = "".join(PATTERN_EXAMPLES[n] + s for n, s in parts)
    compiled = compile_grok(template)
    named = named_group_regex(compiled)
    m_num = re.search(compiled.regex, line)
    m_named = re.search(named, line)
    assert m_num and m_named
    for f in compiled.fields:
        assert m_num.group(f.group) == m_named.group(f"g{f.group}")


@settings(max_examples=100)
@given(st.text(alphabet=string.printable, max_size=40))
def test_noncapturing_never_adds_capture_groups(body):
    """_noncapturing output, when it still compiles, has zero capturing
    groups (that's its whole job — keep group indices dense for the
    compiler's own captures)."""
    rewritten = _noncapturing(body)
    try:
        rx = re.compile(rewritten)
    except re.error:
        return  # arbitrary text need not be a valid regex
    assert rx.groups == 0


# ---------------------------------------------------------------------------
# MetricsRegistry (A32)
# ---------------------------------------------------------------------------

_label_keys = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=5)
_label_vals = st.text(alphabet=string.ascii_letters + string.digits, min_size=1, max_size=8)


@settings(max_examples=100)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a_total", "b_total", "c_total"]),
            st.dictionaries(_label_keys, _label_vals, max_size=2),
            st.integers(min_value=1, max_value=1000),
        ),
        max_size=30,
    )
)
def test_registry_counters_sum_and_render_roundtrip(ops):
    """inc() accumulates exactly; render() emits one sample line per
    (name, labelset) whose value parses back to the accumulated sum."""
    reg = MetricsRegistry()
    expect: dict[tuple, float] = {}
    for name, labels, amount in ops:
        reg.inc(name, labels, amount)
        key = (name, tuple(sorted(labels.items())))
        expect[key] = expect.get(key, 0) + amount
    for (name, labels), total in expect.items():
        assert reg.value(name, dict(labels)) == total
    rendered = reg.render()
    sample_lines = [
        l for l in rendered.splitlines() if l and not l.startswith("#")
    ]
    assert len(sample_lines) == len(expect)
    for line in sample_lines:
        val = float(line.rsplit(" ", 1)[1])
        assert val == int(val) and val >= 1


# ---------------------------------------------------------------------------
# Oracle harness canonicalization (tools/check_oracle mirrors the driver)
# ---------------------------------------------------------------------------

def _table_hash(cols, rows):
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "check_oracle", os.path.join(os.path.dirname(__file__), "..", "tools", "check_oracle.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.table_hash(cols, rows)


_cell = st.one_of(
    st.none(),
    st.integers(min_value=-(10**9), max_value=10**9),
    st.text(alphabet=string.ascii_letters, max_size=6),
    st.booleans(),
)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.lists(_cell, min_size=3, max_size=3), min_size=1, max_size=8), st.randoms())
def test_table_hash_is_order_insensitive(rows, rnd):
    """The correctness-gate hash must be invariant under row order and
    column order (with names permuted consistently) — exactly the
    equivalence the driver's compare relies on."""
    cols = ["a", "b", "c"]
    base = _table_hash(cols, [tuple(r) for r in rows])

    shuffled_rows = list(rows)
    rnd.shuffle(shuffled_rows)
    assert _table_hash(cols, [tuple(r) for r in shuffled_rows]) == base

    perm = [2, 0, 1]
    perm_cols = [cols[i] for i in perm]
    perm_rows = [tuple(r[i] for i in perm) for r in rows]
    assert _table_hash(perm_cols, perm_rows) == base


# ---------------------------------------------------------------------------
# BPE merge training vs a pure-Python reference implementation
# ---------------------------------------------------------------------------

def _ref_bpe_merges(word_counts: dict[str, int], n_rounds: int):
    """Reference BPE trainer: symbol lists per word, adjacent-pair counts
    (every adjacent position, overlaps included), winner = (count desc,
    pair lexicographic), merge applied greedily LEFT-TO-RIGHT without
    overlap — the classic algorithm the Spark wrapped-string replace must
    reproduce exactly."""
    vocab = {w: [list(w), c] for w, c in word_counts.items()}
    merges = []
    for rnd in range(1, n_rounds + 1):
        counts: dict[tuple, int] = {}
        for syms, c in vocab.values():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + c
        if not counts:
            break
        (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, l, r, l + r, cnt))
        for entry in vocab.values():
            syms = entry[0]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            entry[0] = out
    return merges, {w: len(e[0]) for w, e in vocab.items()}


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        min_size=1,
        max_size=12,
    )
)
def test_bpe_train_and_encode_match_python_reference(spark, tmp_path_factory, words):
    """Spark's wrapped-string-replace BPE (train AND encode) must equal
    the classic per-symbol-list algorithm on arbitrary corpora —
    including adversarial overlap cases like 'aaaa' where greedy
    non-overlapping application is what distinguishes a correct merge
    from a regex-style rescan."""
    from collections import Counter

    from kinesis2elastic_spark.operators import corpus

    text = " ".join(words)
    tmp = tmp_path_factory.mktemp("bpe_prop")
    sf = str(tmp)
    spark.createDataFrame([(1, text)], "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{sf}/documents.parquet")

    want_merges, want_enc = _ref_bpe_merges(Counter(words), 4)
    got_merges = [
        tuple(r) for r in corpus.q_bpe_train(spark, sf, n_rounds=4).collect()
    ]
    assert got_merges == want_merges

    got = corpus.q_bpe_encode(spark, sf, n_rounds=4).collect()[0]
    assert got.n_bpe_tokens == sum(want_enc[w] for w in words)
    assert got.n_words == len(words)
    assert got.n_init_syms == sum(len(w) for w in words)


def test_distributed_ntile_equals_window_ntile(spark):
    """Property: distributed_ntile (histogram + tie-rank + BIGINT rank
    arithmetic — q_quality_buckets' scale path) must equal the
    declarative global-window ntile on adversarial tie distributions:
    heavy ties, all-equal keys, n < k, n % k != 0."""
    from hypothesis import given, settings, strategies as st
    from pyspark.sql import Window as W, functions as F

    from kinesis2elastic_spark.operators.llmops import distributed_ntile

    @settings(max_examples=10, deadline=None)
    @given(
        qs=st.lists(st.integers(min_value=0, max_value=3), min_size=1, max_size=37),
        k=st.sampled_from([1, 3, 10]),
    )
    def check(qs, k):
        df = spark.createDataFrame(
            [(i, q) for i, q in enumerate(qs)], "rid long, q long"
        )
        want = {
            r.rid: r.nt
            for r in df.withColumn(
                "nt",
                F.ntile(k).over(W.orderBy("q", "rid")).cast("long"),
            ).collect()
        }
        # both gate branches (r8): the fast single-bucket path (default
        # threshold) AND the range-bucket recursion (threshold=0)
        for thr in (10_000, 0):
            got = {
                r.rid: r.bucket
                for r in distributed_ntile(
                    df, "q", "rid", k, tie_threshold=thr
                ).collect()
            }
            assert got == want, (qs, k, thr, got, want)

    check()


def test_distributed_ntile_saturated_key_spreads_ties(spark):
    """r6 VERDICT #2 (B98 residual): a PLANTED fully-saturated corpus —
    every row in ONE qcol tie group, the shape a >200-word web corpus
    produces under the capped quality score — must still (a) assign exact
    ntile buckets and (b) spread the tie group across the range
    sub-buckets so no single task/cell receives more than a ~1/4096
    share (here: max cell ≤ 2·ceil(n/DNTILE_TIE_BUCKETS))."""
    from pyspark.sql import Window as W, functions as F

    from kinesis2elastic_spark.operators.llmops import (
        DNTILE_TIE_BUCKETS,
        distributed_ntile,
    )

    n = 20000
    df = spark.range(n).select(
        (F.col("id") * 7 + 13).alias("rid"), F.lit(1000000).alias("q")
    )
    out = distributed_ntile(df, "q", "rid", 10)
    want = df.withColumn(
        "nt", F.ntile(10).over(W.orderBy("q", "rid")).cast("long")
    )
    got = {r.rid: r.bucket for r in out.collect()}
    assert got == {r.rid: r.nt for r in want.collect()}
    # every decile is exactly n/10 — the split really happened
    sizes = {r.bucket: r.c for r in out.groupBy("bucket").agg(F.count("*").alias("c")).collect()}
    assert sizes == {i: n // 10 for i in range(1, 11)}
    # the tie-rank window ran partitioned by (q, sub-bucket): recompute the
    # cells with the module's own bucketing and bound the largest one
    lo, hi = df.agg(F.min("rid"), F.max("rid")).first()
    width = max(1, -(-(hi - lo + 1) // DNTILE_TIE_BUCKETS))
    cells = (
        df.withColumn("sub", F.expr(f"(CAST(rid AS BIGINT) - {lo}) div {width}"))
        .groupBy("q", "sub")
        .agg(F.count("*").alias("c"))
    )
    max_cell = cells.agg(F.max("c")).first()[0]
    n_cells = cells.count()
    assert n_cells > DNTILE_TIE_BUCKETS / 2, n_cells
    assert max_cell <= 2 * (-(-n // DNTILE_TIE_BUCKETS)), (max_cell, n_cells)


def test_quantile_select_matches_bruteforce(spark):
    """B107 property: two-pass bucket selection must return exactly the
    value at rank 1 + (p(n-1)) div 100 of the sorted micro-unit values —
    checked against a driver-side sort on adversarial shapes (ties,
    negatives, tiny n, values spanning many buckets)."""
    from hypothesis import given, settings, strategies as st

    from kinesis2elastic_spark.operators import relational_ext as rx

    @settings(max_examples=8, deadline=None)
    @given(
        vs=st.lists(
            st.integers(min_value=-(10**7), max_value=10**13),
            min_size=1,
            max_size=60,
        )
    )
    def check(vs):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vs)], "event_id long, v long"
        ).selectExpr("event_id", "v / 1000000.0 as value")
        fake_load = lambda _s, _d, _t: df  # noqa: E731
        orig = rx.load
        rx.load = fake_load
        try:
            got = {
                (r.pct, r.rank): (r.v_micro, r.n)
                for r in rx.q_quantile_select(spark, "ignored").collect()
            }
        finally:
            rx.load = orig
        n = len(vs)
        # value/1e6 then floor(x*1e6+0.5) snap can differ by ±1 µ-unit from
        # the original int for huge magnitudes — recompute the snapped set
        snapped = sorted(
            r.sv for r in df.selectExpr(
                "CAST(floor(value * 1000000 + 0.5) AS LONG) AS sv"
            ).collect()
        )
        for p in rx.QSEL_PCTS:
            rank = 1 + (p * (n - 1)) // 100
            assert got[(p, rank)] == (snapped[rank - 1], n), (vs, p)

    check()


def test_grouped_ols_exact_planted_slope(spark):
    """B112 property: the sufficient-statistic decomposition recovers a
    PLANTED slope exactly.  Points per group lie on y = a + b*x plus a
    residual pattern that sums to zero against x (sum(r)=0, sum(r*x)=0),
    so OLS slope_num/slope_den must equal b exactly as a fraction of
    BIGINTs — no float tolerance anywhere."""
    from kinesis2elastic_spark.operators import relational_ext as rx

    rows = []
    planted = {1: (700, 3), 2: (-50, -7), 3: (123456, 0)}
    for g, (a, b) in planted.items():
        # x = 1..8; residual pattern orthogonal to both 1 and x:
        # sum(r) = 0 and sum(r*x) = d*(1-2-3+4+5-6-7+8) = 0
        d = 30
        resid = [d, -d, -d, d, d, -d, -d, d]
        for i, x in enumerate(range(1, 9)):
            rows.append((g, float(x), (a + b * x + resid[i]) / 100.0))
    df = spark.createDataFrame(
        rows, "l_suppkey long, l_quantity double, l_extendedprice double"
    )
    orig = rx.load
    rx.load = lambda _s, _d, _t: df
    try:
        out = {r.l_suppkey: r for r in rx.q_grouped_ols(spark, "x").collect()}
    finally:
        rx.load = orig
    # residual orthogonality makes the planted b the exact OLS solution
    for g, (a, b) in planted.items():
        r = out[g]
        xs = list(range(1, 9))
        assert r.n == 8 and r.sum_x == sum(xs) and r.sum_xx == sum(x * x for x in xs)
        assert r.slope_den == r.n * r.sum_xx - r.sum_x * r.sum_x > 0
        # exact fraction equality: num/den == b  <=>  num == b*den
        assert r.slope_num == b * r.slope_den, (g, r)
        assert r.slope_positive == (b > 0)


def test_winsorize_planted_outliers(spark):
    """B116 property: clamp bounds are the exact global p01/p99 order
    statistics and the clamped sum/counters match a pure-Python
    winsorization — planted heavy outliers on both tails."""
    from kinesis2elastic_spark.operators import relational_ext as rx

    # 200 cents-values: 2 extreme lows, 2 extreme highs, bulk in middle
    vals = [-(10**9), -(10**8)] + list(range(1000, 1196)) + [10**8, 10**9]
    flags = ["A" if i % 3 else "B" for i in range(len(vals))]
    df = spark.createDataFrame(
        [(f, v / 100.0) for f, v in zip(flags, vals)],
        "l_returnflag string, l_extendedprice double",
    )
    orig = rx.load
    rx.load = lambda _s, _d, _t: df
    try:
        out = {r.l_returnflag: r for r in rx.q_winsorize(spark, "x").collect()}
    finally:
        rx.load = orig
    n = len(vals)
    s = sorted(vals)
    lo = s[(1 * (n - 1)) // 100]
    hi = s[(99 * (n - 1)) // 100]
    for flag in ("A", "B"):
        mine = [v for f, v in zip(flags, vals) if f == flag]
        r = out[flag]
        assert (r.lo_cut, r.hi_cut) == (lo, hi)
        assert r.n == len(mine)
        assert r.n_clamped_lo == sum(1 for v in mine if v < lo)
        assert r.n_clamped_hi == sum(1 for v in mine if v > hi)
        assert r.sum_wins_cents == sum(min(max(v, lo), hi) for v in mine)


def test_bitmap_distinct_matches_exact(spark, sf_dir):
    """B127: popcount-summed 63-bit-word bitmaps equal count(distinct)
    per group, and rollup-mergeability holds (re-OR of per-half words ==
    whole-table words)."""
    from pyspark.sql import functions as F

    from kinesis2elastic_spark.catalog import load
    from kinesis2elastic_spark.operators import relational_ext as rx

    got = {
        r.event_type: r.n_distinct_users
        for r in rx.q_bitmap_distinct(spark, sf_dir).collect()
    }
    e = load(spark, sf_dir, "events")
    want = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


def test_md5_helpers_cross_engine_equal(spark):
    """The shared md5-prefix pair (functions/hashing.py) must agree
    between Spark and DuckDB on adversarial strings (unicode, quotes,
    empty, long) and widths 4/8/15."""
    import duckdb

    from kinesis2elastic_spark.functions import hashing as H
    from pyspark.sql import functions as F

    vals = ["", "a", "hello world", 'q"uo\'te', "véry üni ☃", "x" * 500, "123"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    con = duckdb.connect()
    for n in (4, 8, 15):
        got = {
            r.s: r.h
            for r in df.select("s", H.md5_prefix_long(F.col("s"), n).alias("h")).collect()
        }
        for v in vals:
            # the generator repeats the inner expression once per hex digit
            want = con.execute(
                "SELECT " + H.md5_hex_sql("?", n), [v] * n
            ).fetchone()[0]
            assert got[v] == want, (v, n)


def test_bfs_random_graphs_match_python(spark):
    """Hypothesis: BFS min-distances equal the pure-Python reference on
    arbitrary random digraphs (cycles, self-loops, multi-edges, islands)."""
    from hypothesis import given, settings, strategies as st

    from kinesis2elastic_spark.operators import graph
    from tests.test_graph import _py_bfs

    node = st.integers(min_value=0, max_value=11).map(str)

    @settings(max_examples=5, deadline=None)
    @given(
        edges=st.lists(st.tuples(node, node), min_size=1, max_size=25),
        seeds=st.sets(node, min_size=1, max_size=3),
        hops=st.integers(min_value=1, max_value=5),
    )
    def check(edges, seeds, hops):
        got = {
            r.node: r.dist
            for r in graph.bfs_reachability(
                spark.createDataFrame(edges, "src string, dst string"),
                spark.createDataFrame([(s,) for s in seeds], "node string"),
                hops,
            ).collect()
        }
        assert got == _py_bfs(edges, sorted(seeds), hops)

    check()


def test_winsorize_degenerate_all_equal(spark):
    """All-identical values: lo == hi == the value, nothing clamps."""
    from kinesis2elastic_spark.operators import relational_ext as rx

    df = spark.createDataFrame(
        [("A", 5.00)] * 7, "l_returnflag string, l_extendedprice double"
    )
    orig = rx.load
    rx.load = lambda _s, _d, _t: df
    try:
        r = rx.q_winsorize(spark, "x").collect()[0]
    finally:
        rx.load = orig
    assert (r.lo_cut, r.hi_cut) == (500, 500)
    assert r.n_clamped_lo == 0 and r.n_clamped_hi == 0
    assert r.sum_wins_cents == 3500


def test_lpa_random_digraphs_match_python(spark):
    """Hypothesis: synchronous LPA labels equal the pure-Python reference
    on arbitrary random digraphs (self-loops, multi-edges, nodes without
    in-edges, disconnected islands) for 1-3 rounds."""
    from hypothesis import given, settings, strategies as st

    from kinesis2elastic_spark.operators import graph
    from tests.test_graph import _py_lpa

    node = st.integers(min_value=0, max_value=11).map(str)

    @settings(max_examples=5, deadline=None)
    @given(
        edges=st.lists(st.tuples(node, node), min_size=1, max_size=25),
        rounds=st.integers(min_value=1, max_value=3),
    )
    def check(edges, rounds):
        got = {
            (r.node, r.label)
            for r in graph.label_propagation(
                spark.createDataFrame(edges, "src string, dst string"),
                rounds,
            ).collect()
        }
        assert got == set(_py_lpa(edges, rounds).items())

    check()


def test_variant_semantics(spark):
    """B200 VARIANT surface: typed extraction, missing-path NULL,
    try-cast NULL, variant-null detection, schema inference."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [('{"a": {"b": 7}, "xs": [1, 2, 3], "s": "hi", "z": null}',)],
        "doc string",
    )
    v = F.parse_json(F.col("doc"))
    row = df.select(
        F.variant_get(v, "$.a.b", "bigint").alias("b"),
        F.variant_get(v, "$.xs[2]", "int").alias("x2"),
        F.size(F.variant_get(v, "$.xs", "array<variant>")).alias("nx"),
        F.variant_get(v, "$.nope", "string").alias("missing"),
        F.try_variant_get(v, "$.s", "bigint").alias("bad_cast"),
        F.is_variant_null(F.variant_get(v, "$.z", "variant")).alias("z_is_null"),
        F.is_variant_null(F.variant_get(v, "$.s", "variant")).alias("s_is_null"),
        F.schema_of_variant(v).alias("schema"),
    ).collect()[0]
    assert row.b == 7 and row.x2 == 3 and row.nx == 3
    assert row.missing is None and row.bad_cast is None
    assert row.z_is_null is True and row.s_is_null is False
    assert "a: OBJECT" in row.schema and "xs: ARRAY" in row.schema
    # malformed input: parse_json raises at execution, try_parse_json -> NULL
    bad = spark.createDataFrame([("{not json",)], "doc string")
    assert (
        bad.select(F.try_parse_json("doc").alias("v"))
        .filter(F.col("v").isNull())
        .count()
        == 1
    )


def test_recursive_cte_hierarchy_depths(spark):
    """B201: WITH RECURSIVE over the unique-parent binary hierarchy —
    every k reached exactly once at depth floor(log2 k)."""
    import math

    spark.createDataFrame(
        [(k,) for k in range(1, 64)], "p_partkey long"
    ).createOrReplaceTempView("part")
    rows = spark.sql(
        """
        WITH RECURSIVE anc(k, depth) AS (
          SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT)
          UNION ALL
          SELECT CAST(p.p_partkey AS BIGINT), a.depth + 1
          FROM anc a JOIN part p
            ON CAST(floor(p.p_partkey / 2) AS BIGINT) = a.k
          WHERE p.p_partkey > 1
        )
        SELECT k, depth FROM anc
        """
    ).collect()
    got = {r.k: r.depth for r in rows}
    assert len(rows) == len(got) == 63  # exactly once each
    assert got == {k: int(math.log2(k)) for k in range(1, 64)}


def test_pipe_sql_matches_nested_form(spark):
    """B202: a |> pipeline and its nested-SELECT form agree row-for-row."""
    spark.range(100).selectExpr(
        "id", "id % 7 AS g", "id * 1.5 AS v"
    ).createOrReplaceTempView("t_pipe")
    piped = spark.sql(
        """
        FROM t_pipe
        |> WHERE id >= 10
        |> EXTEND v * 2 AS v2
        |> AGGREGATE SUM(v2) AS s, COUNT(*) AS n GROUP BY g
        """
    )
    plain = spark.sql(
        "SELECT g, SUM(v * 2) AS s, COUNT(*) AS n FROM t_pipe "
        "WHERE id >= 10 GROUP BY g"
    )
    assert sorted(map(tuple, piped.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_udtf_polymorphic_analyze(spark):
    """B213 companion: a UDTF whose OUTPUT SCHEMA is computed at
    plan time from its arguments (Spark 4's analyze() static method) —
    the n-wide expansion gets n columns, checked for two widths."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class ExpandN:
        @staticmethod
        def analyze(n: AnalyzeArgument) -> AnalyzeResult:
            width = int(n.value)
            return AnalyzeResult(
                StructType(
                    [StructField(f"c{i}", LongType()) for i in range(width)]
                )
            )

        def eval(self, n: int):
            yield tuple(range(int(n)))

    spark.udtf.register("expand_n", udtf(ExpandN))
    assert spark.sql("SELECT * FROM expand_n(2)").columns == ["c0", "c1"]
    assert spark.sql("SELECT * FROM expand_n(4)").collect()[0][3] == 3
