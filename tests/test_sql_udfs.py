"""SQL-function registration tests: every macro matches its Column-
builder twin, and the expansion stays a pure expression (no Python
UDF nodes in the plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from poormans_kube_etl_spark.functions import duration_hmm
from poormans_kube_etl_spark.functions.sql_udfs import register_sql_functions
from poormans_kube_etl_spark.plans.inspect import has_python_row_udf


def test_sql_functions_match_column_builders(spark):
    names = register_sql_functions(spark)
    assert "dur_hmm" in names and "vec_cosine" in names

    df = spark.createDataFrame([(8100,), (59,), (90000,)], "s long")
    df.createOrReplaceTempView("t_secs")
    via_sql = [r.d for r in spark.sql("SELECT dur_hmm(s) AS d FROM t_secs ORDER BY s").collect()]
    via_col = [
        r.d
        for r in df.select(duration_hmm(F.col("s")).alias("d"), "s")
        .orderBy("s")
        .collect()
    ]
    assert via_sql == via_col == ["0h:00mins", "2h:15mins", "1h:00mins"]

    texts = spark.createDataFrame([("  Hello   World ",)], "t string")
    texts.createOrReplaceTempView("t_text")
    row = spark.sql(
        "SELECT norm_text(t) AS n, fingerprint_md5(t) AS f, ws_token_count(norm_text(t)) AS c "
        "FROM t_text"
    ).first()
    assert row.n == "hello world" and row.c == 2
    assert row.f == spark.sql("SELECT md5('hello world') AS m").first().m

    row = spark.sql(
        "SELECT path_segment('pending/1538055240/bulk.txt', 1) AS seg, "
        "is_epoch_label('1538055240') AS ok, is_epoch_label('nope') AS bad"
    ).first()
    assert row.seg == "1538055240" and row.ok and not row.bad

    row = spark.sql(
        "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, "
        "round(vec_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)), 9) AS c"
    ).first()
    assert row.d == 11.0 and row.c == 1.0


def test_sql_functions_stay_jvm_side(spark):
    register_sql_functions(spark)
    df = spark.sql("SELECT dur_hmm(id) AS d, fingerprint_md5(CAST(id AS STRING)) AS f FROM range(100)")
    assert not has_python_row_udf(df)
    assert df.count() == 100


def test_exact_long_sum_equals_decimal_sum(spark):
    """r5 money fast path: exact_long_sum (integer-unit split sums) must
    be BIT-identical to hash_safe(F.sum(money(c))) — same exact integer,
    one nearest-rounding to double — on adversarial values: decimal-cast
    boundary doubles, negatives, NULLs, magnitudes past 2^53 cents
    (where a naive double(sum)/100 double-rounds), and an all-NULL
    group."""
    from pyspark.sql import functions as F

    from poormans_kube_etl_spark.functions import (
        exact_long_sum,
        hash_safe,
        money,
        money_units,
    )

    rows = [
        ("a", 0.005), ("a", 2.675), ("a", -1.115), ("a", None),
        ("a", 123456789012345.67),   # 1.2e16 cents > 2^53
        ("b", -0.005), ("b", 98765432109876.54), ("b", 0.01),
        ("c", None),                  # all-NULL group -> NULL both ways
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["g"]: (r["fast"], r["slow"])
        for r in df.groupBy("g")
        .agg(
            exact_long_sum(money_units("v"), 2).alias("fast"),
            hash_safe(F.sum(money("v"))).alias("slow"),
        )
        .collect()
    }
    assert set(got) == {"a", "b", "c"}
    for g, (fast, slow) in got.items():
        assert fast == slow or (fast is None and slow is None), (g, fast, slow)
    assert got["c"] == (None, None)


def test_exact_long_sum_product_units(spark):
    """Two-factor unit products (q1's disc/charge pattern) must equal
    the decimal-multiply form exactly."""
    from pyspark.sql import functions as F

    from poormans_kube_etl_spark.functions import (
        exact_long_sum,
        hash_safe,
        money,
        money_units,
    )

    rows = [(100.05, 0.05), (9999999.99, 0.10), (0.01, 0.00), (55.55, 0.07)]
    df = spark.createDataFrame(rows, "price double, disc double")
    one = F.lit(1).cast("decimal(18,2)")
    out = df.agg(
        exact_long_sum(
            money_units("price") * (F.lit(100) - money_units("disc")), 4
        ).alias("fast"),
        hash_safe(F.sum(money("price") * (one - money("disc"))), 4).alias("slow"),
    ).collect()[0]
    assert out["fast"] == out["slow"], (out["fast"], out["slow"])
