"""Property-based tests (hypothesis) for the reference-semantics
helpers — the truth-table style of src/helpers.spec.js generalized to
randomized inputs. Each example builds ONE small DataFrame and checks
the Spark expression against an independent Python model."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_duration(seconds: int) -> str:
    """Independent model of reference getJobDuration (helpers.js:65-73):
    floor(s/3600)%24 hours, floor(s/60)%60 zero-padded minutes."""
    h = (seconds // 3600) % 24
    m = (seconds // 60) % 60
    return f"{h}h:{m:02d}mins"


@SETTINGS
@given(st.lists(st.integers(min_value=0, max_value=3_000_000), min_size=1, max_size=20))
def test_duration_format_parity(spark, seconds):
    from poormans_kube_etl_spark.functions import duration_hmm

    df = spark.createDataFrame([(s,) for s in seconds], "s long")
    got = [r.d for r in df.select(duration_hmm(F.col("s")).alias("d")).collect()]
    assert got == [_py_duration(s) for s in seconds]


@SETTINGS
@given(
    st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=5), min_size=1, max_size=30
    ),
    st.integers(min_value=2, max_value=4),
)
def test_word_shingles_model(spark, toks, n):
    from poormans_kube_etl_spark.operators.text import word_shingles

    df = spark.createDataFrame([(toks,)], "toks array<string>")
    [row] = df.select(word_shingles(F.col("toks"), n).alias("sh")).collect()
    if len(toks) >= n:
        expected = sorted({" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)})
    else:
        expected = [" ".join(toks)]  # short docs degrade to whole-doc shingle
    assert sorted(row.sh) == expected
    assert len(row.sh) > 0  # never empty: the explode-filter-free invariant


@SETTINGS
@given(st.text(alphabet="abcdefghijklmnopqr .,", min_size=0, max_size=120))
def test_subword_count_matches_python_model(spark, text):
    """r12 (VERDICT r11 #6): the BPE-calibration token estimate is
    Σ_w ceil(len(w)/4) over the NORMALIZED whitespace words — checked
    against an independent Python model, including empty/whitespace-only
    degenerates (0 tokens) and long unbroken words (multiple pieces)."""
    import math

    from poormans_kube_etl_spark.operators.text import (
        normalize_text,
        subword_count,
    )

    df = spark.createDataFrame([(text,)], "t string")
    [row] = df.select(subword_count(normalize_text("t")).alias("n")).collect()
    norm = " ".join(text.lower().split())
    expected = sum(math.ceil(len(w) / 4) for w in norm.split(" "))
    assert row.n == expected


@SETTINGS
@given(st.text(alphabet="abcdefgh ", min_size=1, max_size=80))
def test_minhash_identical_docs_always_pair(spark, text):
    from poormans_kube_etl_spark.operators.minhash import minhash_near_duplicates

    docs = spark.createDataFrame([(1, text), (2, text)], "doc_id long, text string")
    pairs = minhash_near_duplicates(docs, threshold=0.99).collect()
    assert [(p.a, p.b) for p in pairs] == [(1, 2)]
    assert pairs[0].jaccard == 1.0
    # the md5 (cross-engine) hash family must satisfy the same law:
    # identical docs share every shingle fingerprint, hence every
    # signature slot, hence every band bucket — always a J=1.0 pair
    pairs = minhash_near_duplicates(docs, threshold=0.99, hash_family="md5").collect()
    assert [(p.a, p.b) for p in pairs] == [(1, 2)]
    assert pairs[0].jaccard == 1.0


@SETTINGS
@given(
    st.lists(st.text(alphabet="abcd ", min_size=1, max_size=40), min_size=2, max_size=6)
)
def test_simhash_hamming_is_metric_like(spark, texts):
    from poormans_kube_etl_spark.operators.simhash import simhash_bits_df, hamming_distance

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    fps = simhash_bits_df(docs)
    a = fps.alias("a")
    b = fps.alias("b")
    rows = (
        a.crossJoin(b)
        .select(
            F.col("a.doc_id").alias("i"),
            F.col("b.doc_id").alias("j"),
            hamming_distance(F.col("a.bits"), F.col("b.bits")).alias("h"),
        )
        .collect()
    )
    h = {(r.i, r.j): r.h for r in rows}
    for (i, j), d in h.items():
        assert 0 <= d <= 64
        assert h[(j, i)] == d  # symmetric
        if i == j:
            assert d == 0  # identity
    for i, ti in enumerate(texts):
        for j, tj in enumerate(texts):
            if ti == tj:
                assert h[(i, j)] == 0  # equal text → equal fingerprint


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1_500_000_000, max_value=1_600_000_000),
            st.sampled_from(["bulk.txt", "incremental.txt", "data.csv.gz", None]),
        ),
        min_size=0,
        max_size=12,
    )
)
def test_oldest_marked_folder_model(spark, tmp_path_factory, folders):
    """discover() == python-min over folders that carry a marker —
    the reference's getIngestJobParams truth table randomized."""
    import os

    from poormans_kube_etl_spark.streaming.orchestrator import Orchestrator

    landing = str(tmp_path_factory.mktemp("landing"))
    os.makedirs(f"{landing}/pending", exist_ok=True)
    marked = {}
    for ts, fname in folders:
        d = f"{landing}/pending/{ts}"
        os.makedirs(d, exist_ok=True)
        if fname:
            open(f"{d}/{fname}", "w").write("")
            if fname in ("bulk.txt", "incremental.txt") and ts not in marked:
                # first marker wins per folder in this model; ok since
                # hypothesis rarely emits both markers for one ts, and
                # the engine would pick either deterministically by key
                marked.setdefault(ts, fname)
    out = Orchestrator(spark, landing, landing + "_out").discover()
    expected = min(marked) if marked else None
    if expected is None:
        assert out is None
    else:
        assert out.ingest_name == str(expected)


def test_exact_jaccard_bounds(spark):
    from pyspark.sql import functions as F2

    from poormans_kube_etl_spark.operators.minhash import (
        exact_jaccard,
        exploded_shingles,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(i, f"token{i} alpha beta gamma delta token{i + 1}") for i in range(6)],
        "doc_id long, text string",
    )
    signed = minhash_signatures(exploded_shingles(docs, "doc_id", "text", 2), "doc_id", 16)
    pairs = spark.createDataFrame(
        [(i, j) for i in range(6) for j in range(i + 1, 6)], "a long, b long"
    )
    jac = exact_jaccard(pairs, signed, "doc_id").collect()
    assert len(jac) == 15
    for r in jac:
        assert 0.0 <= r.jaccard <= 1.0


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),      # query_id
            st.integers(min_value=0, max_value=50),     # nn_id
            st.integers(min_value=-100, max_value=100),  # sim (int → exact doubles)
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=5),
)
def test_two_stage_topk_equals_window_topk(spark, rows, k):
    """The two-stage top-k rewrite (partial per-partition select + merge)
    must return EXACTLY the naive Window.partitionBy(query_id) top-k —
    same rows, same ranks — for any scored input, including duplicate
    sims (ties broken by nn_id) and duplicate (query, nn) rows."""
    from pyspark.sql import Window

    from poormans_kube_etl_spark.operators.similarity import _topk_per_query

    # dedupe (query, nn) pairs: both forms assume one score per pair
    uniq = {(q, n): s for q, n, s in rows}
    data = [(q, n, float(s)) for (q, n), s in uniq.items()]
    scored = spark.createDataFrame(data, "query_id long, nn_id long, sim double").repartition(4)

    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("nn_id"))
    naive = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .collect()
    )
    fast = _topk_per_query(scored, k).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted(((r.query_id, r.rank, r.nn_id, r.sim) for r in naive)) == sorted(
        ((r.query_id, r.rank, r.nn_id, r.sim) for r in fast)
    )


# ---------------------------------------------------------------------------
# MERGE model test (r4): upsert.merge_into vs an independent dict model
# over randomized bases/deltas, including NULL keys, NULL partition
# values, and keys colliding across partitions — generalizing the fixed
# crash-matrix cases after this round's namespace/two-phase/NULL work.
# ---------------------------------------------------------------------------
_merge_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=9)),  # key
        st.one_of(st.none(), st.integers(min_value=0, max_value=2)),  # day
        st.integers(min_value=0, max_value=999),  # value
    ),
    min_size=0,
    max_size=12,
)


def _dedupe_by_key(rows):
    """Keep the FIRST row per key — merge semantics assume unique keys
    per side; the generator may repeat them."""
    seen, out = set(), []
    for k, d, v in rows:
        if k not in seen:
            seen.add(k)
            out.append((k, d, v))
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(base=_merge_rows, delta=_merge_rows)
def test_merge_into_matches_dict_model(spark, tmp_path_factory, base, delta):
    from poormans_kube_etl_spark.operators.upsert import merge_into

    base = _dedupe_by_key(base)
    delta = _dedupe_by_key(delta)
    base_day = {k: d for k, d, _ in base}
    # partition-scoped merges require a key's partition value to stay
    # stable; the UNPARTITIONED leg has no such contract (day is just a
    # value column the update overwrites), so only the 'p' leg remaps —
    # the 'u' leg keeps raw deltas and so exercises day-changing updates
    delta_p = [(k, base_day.get(k, d), v) for k, d, v in delta]

    def expected_for(rows):
        model = {k: (d, v) for k, d, v in base}
        model.update({k: (d, v) for k, d, v in rows})
        return sorted(
            ((k, d, v) for k, (d, v) in model.items()),
            key=lambda t: (t[0] is None, t[0], t[1] is None, t[1]),
        )

    schema = "k long, day long, v long"
    tmp = tmp_path_factory.mktemp("merge_model")

    for tag, partition_cols, d_rows in (
        ("u", None, delta),
        ("p", ["day"], delta_p),
    ):
        path = str(tmp / tag)
        if base:
            w = spark.createDataFrame(base, schema).write
            if partition_cols:
                w = w.partitionBy(*partition_cols)
            w.parquet(path)
        elif not delta:
            continue  # nothing on either side: no table to create
        delta_df = (
            spark.createDataFrame(d_rows, schema)
            if d_rows
            else spark.createDataFrame([], schema)
        )
        merge_into(
            spark, path, delta_df, keys=["k"], partition_cols=partition_cols
        )
        got = sorted(
            ((r.k, r.day, r.v) for r in spark.read.parquet(path).collect()),
            key=lambda t: (t[0] is None, t[0], t[1] is None, t[1]),
        )
        assert got == expected_for(d_rows), f"{tag}: {got}"


# ---------------------------------------------------------------------------
# As-of join model test (r4): the merged _asof_join implementation vs
# pandas.merge_asof as an independent model, randomized keys/timestamps
# (including exact ts ties between left and right — the inclusive
# boundary both directions must honor).
# ---------------------------------------------------------------------------
_asof_left = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key
        st.integers(min_value=0, max_value=50),  # ts (seconds)
    ),
    min_size=1,
    max_size=15,
)
_asof_right = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=50),
        st.integers(min_value=0, max_value=999),  # payload
    ),
    min_size=0,
    max_size=15,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_asof_left, right=_asof_right)
def test_asof_join_matches_pandas_model(spark, left, right):
    import pandas as pd

    from poormans_kube_etl_spark.operators.asof import (
        asof_join_backward,
        asof_join_forward,
    )

    # pandas merge_asof needs unique (key, ts) on the right — matching
    # the operator's own contract (latest/earliest right row per ts)
    seen = set()
    right = [r for r in right if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))]
    left = [(i, k, t) for i, (k, t) in enumerate(left)]

    base = "2024-01-01 00:00:"
    ldf = spark.createDataFrame(
        [(i, k, f"2024-01-01 00:00:{t:02d}" if t < 60 else None) for i, k, t in left],
        "lid long, k long, lts string",
    ).selectExpr("lid", "k", "cast(lts as timestamp) as lts")
    rdf = spark.createDataFrame(
        [(k, f"2024-01-01 00:00:{t:02d}", v) for k, t, v in right],
        "k long, rts string, payload long",
    ).selectExpr("k", "cast(rts as timestamp) as rts", "payload")

    lp = pd.DataFrame(
        {"lid": [i for i, _, _ in left], "k": [k for _, k, _ in left],
         "lts": pd.to_datetime([f"2024-01-01 00:00:{t:02d}" for _, _, t in left])}
    ).sort_values("lts", kind="stable")
    rp = pd.DataFrame(
        {"k": [k for k, _, _ in right],
         "rts": pd.to_datetime([f"2024-01-01 00:00:{t:02d}" for _, t, _ in right]),
         "payload": [v for _, _, v in right]}
    ).sort_values("rts", kind="stable")

    for direction, fn in (("backward", asof_join_backward), ("forward", asof_join_forward)):
        got = {
            r.lid: r.payload
            for r in fn(ldf, rdf, ["k"], "lts", "rts", ["payload"]).collect()
        }
        if len(rp):
            model_df = pd.merge_asof(
                lp, rp, left_on="lts", right_on="rts", by="k",
                direction=direction, allow_exact_matches=True,
            )
            model = {
                int(row.lid): (None if pd.isna(row.payload) else int(row.payload))
                for row in model_df.itertuples()
            }
        else:
            model = {int(i): None for i, _, _ in left}
        assert got == model, f"{direction}: {got} != {model}"


@SETTINGS
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.floats(
                min_value=-1e13,
                max_value=1e13,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_exact_long_sum_model(spark, values):
    """r5 money fast path, property form: for ANY mix of doubles and
    NULLs the split-sum must equal (a) the decimal-sum form bit-exactly
    and (b) an independent Python-Decimal model of 'sum of exact
    decimal(18,2) cents, then one nearest-rounding to double'."""
    import decimal

    from poormans_kube_etl_spark.functions import (
        exact_long_sum,
        hash_safe,
        money,
        money_units,
    )

    df = spark.createDataFrame([(v,) for v in values], "v double")
    row = df.agg(
        exact_long_sum(money_units("v"), 2).alias("fast"),
        hash_safe(F.sum(money("v"))).alias("slow"),
    ).collect()[0]
    assert row["fast"] == row["slow"] or (
        row["fast"] is None and row["slow"] is None
    ), (row["fast"], row["slow"], values)
    # independent model: Spark casts double→decimal via the SHORTEST
    # decimal repr (BigDecimal.valueOf / Double.toString), so the model
    # must start from repr(v), not Decimal(v)'s exact binary expansion —
    # they disagree exactly on repr-boundary values like 1.005 (repr
    # "1.005" → 1.01 half-up, exact binary 1.00499… → 1.00). r5 review,
    # verified against Spark 4.1.2.
    cents = [
        decimal.Decimal(repr(v)).quantize(
            decimal.Decimal("0.01"), rounding=decimal.ROUND_HALF_UP
        )
        for v in values
        if v is not None
    ]
    if cents:
        assert row["fast"] == float(sum(cents)), (row["fast"], sum(cents))
    else:
        assert row["fast"] is None


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.one_of(
                st.none(),
                st.text(
                    # printable sans backslash/quote so json.dumps output is
                    # byte-predictable; escape handling has its own example
                    alphabet=st.characters(
                        min_codepoint=32, max_codepoint=126, exclude_characters='\\"'
                    ),
                    max_size=40,
                ),
            ),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_read_jsonl_roundtrip_model(spark, tmp_path_factory, rows):
    """Roundtrip property for the schema-contract reader: any list of
    (bigint, nullable string) records serialized with json.dumps must
    come back EXACTLY through read_jsonl, with zero quarantined lines —
    the parse side of the contract modeled independently of the writer.
    One adversarial malformed line is appended and must be the ONLY
    quarantine row, intact."""
    import json as _json

    from poormans_kube_etl_spark.sources.ingest import read_jsonl, split_quarantine

    d = tmp_path_factory.mktemp("jsonl_prop")
    bad = '{"id": 1, "text": "never closed'
    lines = [_json.dumps({"id": i, "text": t}) for i, t in rows] + [bad]
    (d / "data.jsonl").write_text("\n".join(lines) + "\n")
    df = read_jsonl(spark, str(d), "id bigint, text string")
    valid, quarantined = split_quarantine(df)
    # None-safe sort key: same-id rows with None and '' text are both
    # legal inputs, and Python tuples can't compare None < str
    key = lambda t: (t[0], t[1] is not None, t[1] or "")  # noqa: E731
    got = sorted(((r.id, r.text) for r in valid.collect()), key=key)
    # escapes: json round-trips the text exactly (the strategy excludes
    # backslash/quote only to keep the WRITER predictable, not the reader)
    assert got == sorted(rows, key=key)
    assert [r._corrupt_record for r in quarantined.collect()] == [bad]


@SETTINGS
@given(
    st.floats(min_value=0.05, max_value=0.99),
    st.integers(min_value=1, max_value=4096),
    st.one_of(st.none(), st.integers(min_value=2, max_value=10**12)),
)
def test_srp_banding_never_overspends_budget(threshold, max_planes, n_vectors):
    """Generalizes the ADVICE r05 fix: for ANY (threshold, budget, N)
    the planner must return a plan within the plane budget — both the
    search loop and the no-plan fallback had paths that overspent a
    small budget before r6. The budget is GEMM width and bucket-exchange
    rows, so overspending it is a silent memory/shuffle blowup at scale."""
    from poormans_kube_etl_spark.operators.similarity import srp_banding

    r, bands = srp_banding(threshold, n_vectors=n_vectors, max_planes=max_planes)
    assert r >= 1 and bands >= 1
    assert r * bands <= max_planes, (threshold, max_planes, n_vectors, r, bands)


# ---------------------------------------------------------------------------
# bucket_member_pairs model test (r7): the shared LSH bucket -> pair
# expansion vs an independent Python model — all-pairs within the cap,
# star linking above it, duplicate member ids never self-pairing.
# ---------------------------------------------------------------------------
_bucket_lists = st.lists(
    st.lists(st.integers(min_value=0, max_value=30), min_size=0, max_size=9),
    min_size=1,
    max_size=6,
)


@SETTINGS
@given(buckets=_bucket_lists, max_bucket=st.integers(min_value=2, max_value=6))
def test_bucket_member_pairs_matches_set_model(spark, buckets, max_bucket):
    from itertools import combinations

    from poormans_kube_etl_spark.operators.buckets import bucket_member_pairs

    rows = [(i, members) for i, members in enumerate(buckets)]
    df = (
        spark.createDataFrame(rows, "bucket_id long, raw array<long>")
        .select(
            "bucket_id", F.array_sort(F.array_distinct("raw")).alias("members")
        )
        .where(F.size("members") > 1)
    )
    expected = set()
    for members in buckets:
        m = sorted(set(members))
        if len(m) <= 1:
            continue
        if len(m) <= max_bucket:
            expected |= set(combinations(m, 2))
        else:
            expected |= {(m[0], x) for x in m[1:]}
    got = {(r.a, r.b) for r in bucket_member_pairs(df, "members", max_bucket).collect()}
    assert got == expected
    assert all(a < b for a, b in got)


@SETTINGS
@given(st.text(alphabet="abcdefgh ", min_size=1, max_size=120))
def test_cdc_chunks_partition_the_document(spark, text):
    """Content-defined chunks must PARTITION the token stream exactly:
    contiguous, non-overlapping, nothing dropped — joining the chunk
    texts in order reassembles the normalized document, and the lens
    sum to the token count. (The boundary-placement bug class this
    pins: off-by-one cut indices, a dropped final span, an end-of-doc
    cut creating an empty chunk.)"""
    from poormans_kube_etl_spark.queries import all_queries  # noqa: F401 - registry import
    from poormans_kube_etl_spark.queries.training_pipeline import (
        train_cdc_chunk_documents,
    )

    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")

    import poormans_kube_etl_spark.queries.training_pipeline as tp

    real_docs = tp._docs
    # run the registered builder on the fixture; accept the heavy
    # spread-tier kwarg the CDC face passes (r13)
    tp._docs = lambda s, sf, **kw: docs
    try:
        rows = train_cdc_chunk_documents(spark, "unused").collect()
    finally:
        tp._docs = real_docs
    rows.sort(key=lambda r: r.chunk_start)
    norm = " ".join(text.lower().strip().split())
    if norm == "":
        norm = ""  # empty doc: one empty chunk
    toks = norm.split(" ")
    assert [r.chunk_idx for r in rows] == list(range(len(rows)))
    assert rows[0].chunk_start == 0
    for prev, cur in zip(rows, rows[1:]):
        assert cur.chunk_start == prev.chunk_start + prev.chunk_len
    assert sum(r.chunk_len for r in rows) == len(toks)
    assert " ".join(r.chunk_text for r in rows) == norm


@SETTINGS
@given(
    st.lists(
        # tie-heavy small integers: the regime the GK rank certificate
        # must survive (a value can occupy thousands of ranks)
        st.integers(min_value=1, max_value=5),
        min_size=1,
        max_size=60,
    )
)
def test_gk_rank_certificate_accepts_any_valid_sketch(spark, values):
    """r9 certificate model check: for EVERY data multiset — however
    tie-heavy — and every quantile, the rank-interval test
    (count(v<x) < qN+eps*N AND count(v<=x) >= qN-eps*N) must accept the
    TRUE quantile value (what a within-spec GK sketch returns), and
    must reject a value whose rank interval sits entirely outside the
    tolerance band. Models queries/subqueries.approx_percentile_quantity
    against pure Python."""
    import math

    eps = 1.0 / 10_000
    n = len(values)
    s = sorted(values)

    def ok(x, q):
        lt = sum(1 for v in values if v < x)
        le = sum(1 for v in values if v <= x)
        return (lt < q * n + eps * n) and (le >= q * n - eps * n)

    for q in (0.25, 0.5, 0.75):
        # the exact lower-rank quantile — any conforming sketch output
        exact = s[max(0, math.ceil(q * n) - 1)]
        assert ok(exact, q), (values, q, exact)
    # a value strictly below the minimum occupies rank interval (0, 0]:
    # it must FAIL every quantile whose target rank band excludes 0
    too_small = min(values) - 1
    assert not ok(too_small, 0.75) or 0 >= 0.75 * n - eps * n
    # strictly above the maximum: lt = n, must fail when n >= qN+epsN
    too_big = max(values) + 1
    assert not ok(too_big, 0.25) or n < 0.25 * n + eps * n


def test_spectral_trace_anchor_survives_huge_components(spark):
    """r9 review follow-up: components large enough to push n*max_abs^2
    past the int64 fast-path bound must route BOTH exact sums through
    the arbitrary-precision fallback and still produce the exact
    trace_q (float of the exact integer), while components past int64
    itself raise loudly instead of wrapping."""
    import numpy as np
    import pandas as pd
    import pytest

    from poormans_kube_etl_spark.operators.mlstats import (
        _TRACE_SCALE,
        _spectral_stats,
    )

    # |x| = 5000 -> s = 5e9, s^2 = 2.5e19 > 2^62: fallback branch
    vals = [[5000.0, -5000.0], [4999.5, 5000.0], [-4998.25, 0.5]]
    pdf = pd.DataFrame({"label": [1] * 3, "embedding": vals})
    out = _spectral_stats(pdf)
    n = 3
    s = np.floor(np.array(vals) * float(_TRACE_SCALE) + 0.5).astype(object)
    expect = float(
        sum(
            n * sum(int(x) * int(x) for x in col) - sum(int(x) for x in col) ** 2
            for col in s.T
        )
    )
    assert out["trace_q"].iloc[0] == expect
    assert bool(out["sum_eig_ok"].iloc[0]) and bool(out["eig_nonneg"].iloc[0])

    # past int64 after scaling: loud raise, never silent wraparound
    huge = pd.DataFrame({"label": [1, 1], "embedding": [[1e13], [0.0]]})
    with pytest.raises(ValueError, match="exceeds int64"):
        _spectral_stats(huge)


def _py_duplicate_spans(docs: dict[int, list[str]], k: int):
    """Independent brute-force model of operators/substring.duplicate_
    spans: positions of k-grams occurring in >= 2 distinct docs, merged
    into maximal intervals per doc."""
    from collections import defaultdict

    where = defaultdict(set)  # gram tuple -> {doc_id}
    for d, toks in docs.items():
        for i in range(len(toks) - k + 1):
            where[tuple(toks[i : i + k])].add(d)
    spans = {}
    for d, toks in docs.items():
        hits = [
            (i, i + k)
            for i in range(len(toks) - k + 1)
            if len(where[tuple(toks[i : i + k])]) >= 2
        ]
        merged = []
        for s, e in hits:  # hits are start-sorted
            if merged and s <= merged[-1][1]:
                merged[-1][2] += 1
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e, 1])
        if merged:
            spans[d] = [(s, e - s, n) for s, e, n in merged]
    return spans


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=14
        ),
        min_size=2,
        max_size=6,
    ),
    st.integers(min_value=2, max_value=4),
)
def test_substring_spans_match_bruteforce_model(spark, doc_toks, k):
    """duplicate_spans == an independent Python brute force on random
    tiny corpora over a 4-token alphabet (dense with collisions, so
    merges, within-doc repeats, and full-doc spans all get exercised)."""
    from poormans_kube_etl_spark.operators.substring import duplicate_spans

    docs = {i: t for i, t in enumerate(doc_toks)}
    frame = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {}
    for r in duplicate_spans(frame, k).collect():
        got.setdefault(r.doc_id, []).append(
            (r.span_start, r.span_len, r.n_dup_grams)
        )
    expected = {
        d: [(s, ln, n) for s, ln, n in sp]
        for d, sp in _py_duplicate_spans(docs, k).items()
    }
    got_sorted = {d: sorted(v) for d, v in got.items()}
    assert got_sorted == {d: sorted(v) for d, v in expected.items()}


@SETTINGS
@given(
    st.dictionaries(
        st.integers(min_value=1, max_value=4),                 # user_id
        st.sets(st.integers(min_value=0, max_value=40), min_size=1, max_size=25),
        min_size=1,
        max_size=4,
    )
)
def test_gaps_islands_streaks_match_set_model(spark, tmp_path_factory, user_days):
    """window_gaps_islands_user_streaks vs an independent per-user
    streak fold over the raw day sets (sorted scan counting breaks) —
    no window functions, no island arithmetic, so a shared bug can't
    hide in both."""
    import datetime as dt
    import os

    from poormans_kube_etl_spark.queries.windows_extra import (
        window_gaps_islands_user_streaks,
    )

    base = dt.date(2024, 1, 1)
    rows = []
    eid = 0
    for uid, days in user_days.items():
        for d in days:
            # two events some days: the DISTINCT must collapse them
            for h in ([9] if d % 3 else [9, 17]):
                rows.append(
                    (eid, dt.datetime.combine(base + dt.timedelta(days=d), dt.time(h)),
                     uid, "view", 1.0, "{}")
                )
                eid += 1
    d = tmp_path_factory.mktemp("streaks")
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(str(d), "events.parquet"))
    got = {
        r.user_id: (r.n_streaks, r.longest_streak, r.active_days)
        for r in window_gaps_islands_user_streaks(spark, str(d)).collect()
    }
    for uid, days in user_days.items():
        ds = sorted(days)
        streaks = [1]
        for a, b in zip(ds, ds[1:]):
            if b == a + 1:
                streaks[-1] += 1
            else:
                streaks.append(1)
        assert got[uid] == (len(streaks), max(streaks), len(ds))


@SETTINGS
@given(
    st.lists(
        # tokens drawn FROM the fixed query vocabulary plus fillers —
        # a disjoint alphabet would make every score 0 and the whole
        # property vacuous (r9 review catch: the first draft sampled
        # 'a'..'f' and asserted [] == [] on every example)
        st.lists(
            st.sampled_from(
                ["stream", "batch", "window", "hash", "join", "merge",
                 "fast", "scan", "filler1", "filler2"]
            ),
            min_size=1,
            max_size=12,
        ),
        min_size=2,
        max_size=8,
    )
)
def test_bm25_matches_python_model(spark, tmp_path_factory, docs_tokens):
    """text_bm25_topk vs a direct-from-the-paper Python BM25 (no shared
    code, no inverted index): every emitted score must match the model
    to the query's 6-dp rounding, and the ranking must equal the
    model's (score DESC, doc_id) order."""
    import math
    import os

    from poormans_kube_etl_spark.queries.text_analysis import (
        _BM25_B,
        _BM25_K,
        _BM25_K1,
        _BM25_QUERIES,
        text_bm25_topk,
    )

    corpus = {i: toks for i, toks in enumerate(docs_tokens)}
    rows = [
        (i, " ".join(toks), "en", "s0", len(" ".join(toks)))
        for i, toks in corpus.items()
    ]
    d = tmp_path_factory.mktemp("bm25")
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(str(d), "documents.parquet"))
    got = text_bm25_topk(spark, str(d)).collect()

    n = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n
    df: dict[str, int] = {}
    for toks in corpus.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    expected: dict[int, list[tuple[int, float]]] = {}
    for qid, qtext in _BM25_QUERIES:
        scores = []
        for i, toks in corpus.items():
            s = 0.0
            matched = False
            for term in dict.fromkeys(qtext.split(" ")):
                tf = toks.count(term)
                if tf == 0:
                    continue
                matched = True
                idf = math.log((n - df[term] + 0.5) / (df[term] + 0.5) + 1)
                s += idf * tf * (_BM25_K1 + 1) / (
                    tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * len(toks) / avgdl)
                )
            if matched:
                scores.append((i, round(s, 6)))
        scores.sort(key=lambda p: (-p[1], p[0]))
        expected[qid] = scores[:_BM25_K]
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append((r.doc_id, r.score))
    for qid, exp in expected.items():
        assert by_q.get(qid, []) == exp, (qid, by_q.get(qid), exp)


@SETTINGS
@given(
    st.lists(st.integers(min_value=1, max_value=10_000), min_size=2, max_size=40)
)
def test_mad_outliers_match_python_model(spark, tmp_path_factory, lens):
    """dq_mad_doc_length_outliers vs statistics.median — the exact
    half-integer arithmetic means the comparison is equality, no
    tolerance."""
    import os
    import statistics

    from poormans_kube_etl_spark.queries.data_quality import (
        dq_mad_doc_length_outliers,
    )

    d = tmp_path_factory.mktemp("mad")
    rows = [(i, "x", "en", "s0", n) for i, n in enumerate(lens)]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(str(d), "documents.parquet"))
    r = dq_mad_doc_length_outliers(spark, str(d)).collect()[0]
    med = statistics.median(lens)
    mad = statistics.median(abs(x - med) for x in lens)
    n_out = sum(1 for x in lens if abs(x - med) > 3 * mad)
    assert (r.n_docs, r.n_outliers, r.median_chars, r.mad_chars) == (
        len(lens), n_out, float(med), float(mad),
    )


@SETTINGS
@given(
    st.lists(st.integers(min_value=1, max_value=9_999), min_size=2, max_size=40)
)
def test_winsorize_matches_numpy_percentile_model(spark, tmp_path_factory, lens):
    """clean_winsorize_lengths vs numpy's linear-interpolation
    percentile (the same definition Spark's exact percentile and
    DuckDB's quantile_cont implement): clip values agree to 1e-6 and
    the was_clipped memberships agree EXACTLY — when the quantile
    position is fractional the bound is strictly between integers (a
    ulp can't cross an integer), and when whole, every engine returns
    the exact element."""
    import os

    import numpy as np

    from poormans_kube_etl_spark.queries.corpus_cleanup import (
        clean_winsorize_lengths,
    )

    d = tmp_path_factory.mktemp("wins")
    rows = [(i, "x", "en", "s0", n) for i, n in enumerate(lens)]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(str(d), "documents.parquet"))
    got = {r.doc_id: r for r in clean_winsorize_lengths(spark, str(d)).collect()}
    p05 = float(np.percentile(lens, 5))
    p95 = float(np.percentile(lens, 95))
    for i, n in enumerate(lens):
        r = got[i]
        assert abs(r.clipped - round(min(max(float(n), p05), p95), 4)) <= 1e-6
        assert r.was_clipped == (n < p05 or n > p95)


@SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=3), st.integers(min_value=0, max_value=3)),
        min_size=2,
        max_size=60,
    )
)
def test_jsd_drift_matches_python_model(spark, tmp_path_factory, day_type):
    """events_daily_jsd_drift vs a direct math.log model: exact
    integer-division probabilities both sides, so the only slack is
    transcendental/sum-order ulps — 2e-6 covers the 6-dp round."""
    import datetime
    import math
    import os
    from collections import Counter

    from poormans_kube_etl_spark.queries.analytics import events_daily_jsd_drift

    d = tmp_path_factory.mktemp("jsd")
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(days=day, hours=1), 1, f"t{ty}", 0.0, "{}")
        for i, (day, ty) in enumerate(day_type)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(str(d), "events.parquet"))

    got = {r.day.date(): r.jsd for r in events_daily_jsd_drift(spark, str(d)).collect()}

    daily: dict[int, Counter] = {}
    for day, ty in day_type:
        daily.setdefault(day, Counter())[ty] += 1
    expected: dict[datetime.date, float] = {}
    for day in sorted(daily):
        if day + 1 not in daily:
            continue
        p_c, q_c = daily[day], daily[day + 1]
        np_, nq = sum(p_c.values()), sum(q_c.values())
        jsd = 0.0
        for ty in set(p_c) | set(q_c):
            pp, qq = p_c.get(ty, 0) / np_, q_c.get(ty, 0) / nq
            m = (pp + qq) / 2
            if pp > 0:
                jsd += 0.5 * pp * math.log(pp / m)
            if qq > 0:
                jsd += 0.5 * qq * math.log(qq / m)
        expected[(base + datetime.timedelta(days=day + 1)).date()] = jsd
    assert set(got) == set(expected)
    for day, e in expected.items():
        assert abs(got[day] - e) <= 2e-6, (day, got[day], e)


@SETTINGS
@given(
    st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=40)
)
def test_padding_waste_matches_integer_model(spark, tmp_path_factory, lens):
    """train_padding_waste vs exact Python integer arithmetic — every
    output but the rate is an integer, so the comparison is equality."""
    import math
    import os

    from poormans_kube_etl_spark.queries.training_pipeline import (
        _PAD_SEQ_LEN,
        train_padding_waste,
    )

    d = tmp_path_factory.mktemp("pad")
    rows = [(i, "x", "en", "s0", n) for i, n in enumerate(lens)]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(d), "documents.parquet")
    )
    r = train_padding_waste(spark, str(d)).collect()[0]
    n_seq = sum(math.ceil(n / _PAD_SEQ_LEN) for n in lens)
    padded = n_seq * _PAD_SEQ_LEN - sum(lens)
    assert (r.n_docs, r.total_chars, r.n_sequences, r.padded_chars) == (
        len(lens), sum(lens), n_seq, padded,
    )
    assert abs(r.padding_rate - padded / (n_seq * _PAD_SEQ_LEN)) <= 1e-6
    assert r.packed_sequences == math.ceil(sum(lens) / _PAD_SEQ_LEN)


_ENC_ALPHABET = list("ab YZ9.\t\n") + ["é", "Ã", "©", "�", "\x01", "\x0b", "中"]


@SETTINGS
@given(
    st.lists(
        st.text(alphabet=_ENC_ALPHABET, min_size=1, max_size=30),
        min_size=1,
        max_size=20,
    )
)
def test_encoding_anomalies_match_python_model(spark, tmp_path_factory, texts):
    """dq_encoding_anomalies vs a character-level Python model over an
    adversarial alphabet (mojibake digraph pieces, U+FFFD, C0 controls,
    CJK): all counters are exact integers; the one ratio gets 1e-6."""
    import os

    from poormans_kube_etl_spark.queries.data_quality import dq_encoding_anomalies

    d = tmp_path_factory.mktemp("enc")
    rows = [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(d), "documents.parquet")
    )
    r = dq_encoding_anomalies(spark, str(d)).collect()[0]
    n_chars = sum(len(t) for t in texts)
    non_ascii = sum(1 for t in texts for ch in t if not (" " <= ch <= "~"))
    repl_docs = sum(1 for t in texts if "�" in t)
    moji = sum(t.count("Ã©") for t in texts)
    ctrl = sum(
        1
        for t in texts
        for ch in t
        if ord(ch) <= 0x1F and ch not in ("\t", "\n", "\r")
    )
    assert (r.n_docs, r.n_chars, r.repl_char_docs, r.mojibake_hits, r.ctrl_chars) == (
        len(texts), n_chars, repl_docs, moji, ctrl,
    )
    assert abs(r.non_ascii_rate - non_ascii / n_chars) <= 1e-6


# ---------------------------------------------------------------------------
# r10 oracle-blind-class sweep: queries whose Spark plan and DuckDB
# oracle were HAND-ROLLED IN PARALLEL share any misconception (the
# inverted non-ASCII incident above); each gets an independent
# pure-Python model. Word-based corpora: some English function words
# (the heuristic signal), some content words.

_WORDS = ["the", "and", "of", "banana", "spark", "zebra", "qux"]


def _write_docs(spark, tmp_path_factory, texts, label):
    import os

    d = tmp_path_factory.mktemp(label)
    rows = [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(d), "documents.parquet")
    )
    return str(d)


_TEXTS = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12).map(" ".join),
    min_size=1,
    max_size=15,
)


@SETTINGS
@given(_TEXTS)
def test_repetition_ratio_matches_python_model(spark, tmp_path_factory, texts):
    import re

    from poormans_kube_etl_spark.queries.corpus_cleanup import clean_repetition_ratio

    d = _write_docs(spark, tmp_path_factory, texts, "rep")
    got = {r.doc_id: r for r in clean_repetition_ratio(spark, d).collect()}
    for i, t in enumerate(texts):
        toks = re.sub(r"\s+", " ", t).strip().lower().split(" ")
        if len(toks) >= 3:
            grams = [" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)]
        else:
            grams = [" ".join(toks)]
        r = got[i]
        assert (r.n_grams, r.n_distinct) == (len(grams), len(set(grams)))
        assert abs(r.rep_ratio - (1.0 - len(set(grams)) / len(grams))) <= 1e-6


@SETTINGS
@given(_TEXTS)
def test_quality_and_langid_match_python_model(spark, tmp_path_factory, texts):
    from poormans_kube_etl_spark.operators.text import STOPWORDS_EN
    from poormans_kube_etl_spark.queries.text_analysis import (
        text_langid_heuristic,
        text_quality_scores,
    )

    d = _write_docs(spark, tmp_path_factory, texts, "qual")
    q = {r.doc_id: r for r in text_quality_scores(spark, d).collect()}
    l = {r.doc_id: r for r in text_langid_heuristic(spark, d).collect()}
    for i, t in enumerate(texts):
        toks = t.split(" ")  # RAW split: the query's documented tokenizer
        stop = sum(1 for w in toks if w in STOPWORDS_EN)
        assert (q[i].n_tokens, q[i].stop_cnt) == (len(toks), stop)
        assert q[i].quality_ok == (len(toks) >= 10 and stop > 0)
        assert abs(q[i].stop_ratio - stop / len(toks)) <= 1e-6
        pred = "en" if stop >= 2 else "unk"
        assert (l[i].predicted_lang, l[i].label_match) == (pred, pred == "en")


@SETTINGS
@given(_TEXTS)
def test_unigram_logprob_matches_python_model(spark, tmp_path_factory, texts):
    import math
    import re
    from collections import Counter

    from poormans_kube_etl_spark.queries.text_analysis import (
        text_unigram_logprob_scores,
    )

    d = _write_docs(spark, tmp_path_factory, texts, "ulp")
    got = {r.doc_id: r for r in text_unigram_logprob_scores(spark, d).collect()}
    norm = [re.sub(r"\s+", " ", t).strip().lower().split(" ") for t in texts]
    counts = Counter(w for toks in norm for w in toks)
    tot = sum(counts.values())
    for i, toks in enumerate(norm):
        r = got[i]
        assert r.n_toks == len(toks)
        exp = sum(math.log2(counts[w] / tot) for w in toks) / len(toks)
        assert abs(r.avg_logprob - exp) <= 2e-6, (i, r.avg_logprob, exp)


@SETTINGS
@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40, unique=True))
def test_split_by_hash_matches_python_md5_model(spark, tmp_path_factory, ids):
    import hashlib
    import os
    from collections import Counter

    from poormans_kube_etl_spark.queries.training_pipeline import (
        train_split_by_hash,
        train_stratified_sample,
    )

    d = str(tmp_path_factory.mktemp("split"))
    rows = [(i, "x", "en" if i % 2 == 0 else "zz", "s0", 1) for i in ids]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )

    def bucket(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 100

    exp = Counter()
    for i in ids:
        b = bucket(i)
        split = "train" if b < 80 else ("val" if b < 90 else "test")
        exp[(split, "en" if i % 2 == 0 else "zz")] += 1
    got = {
        (r.split, r.lang): r.n_docs for r in train_split_by_hash(spark, d).collect()
    }
    assert got == dict(exp)

    kept = {
        r.doc_id for r in train_stratified_sample(spark, d).collect()
    }
    exp_kept = {
        i
        for i in ids
        if (i % 2 == 0 and bucket(i) < 10) or (i % 2 == 1 and bucket(i) < 50)
    }
    assert kept == exp_kept
