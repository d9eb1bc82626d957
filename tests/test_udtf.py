"""Python UDTF surface: registration, LATERAL invocation, and parity with
the JVM-native chunker on real data (the two must never drift)."""

import os

from polars_ad_etl_spark.functions.udtfs import register_udtfs
from polars_ad_etl_spark.operators import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_chunk_udtf_matches_jvm_chunker(spark):
    register_udtfs(spark)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.createOrReplaceTempView("_udtf_docs")
    via_udtf = spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.chunk_text, c.chunk_tokens
        FROM _udtf_docs d, LATERAL chunk_text(d.text) c
        """
    )
    via_jvm = QUERIES["curation_doc_chunks"](spark, SF_DIR)
    cols = ["doc_id", "chunk_id", "chunk_text", "chunk_tokens"]
    a = sorted(map(tuple, via_udtf.select(cols).collect()))
    b = sorted(map(tuple, via_jvm.select(cols).collect()))
    assert a == b
    assert len(a) > 0


def test_chunk_udtf_null_and_empty(spark):
    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "one two")], "doc_id int, text string"
    )
    df.createOrReplaceTempView("_udtf_edge")
    rows = spark.sql(
        "SELECT d.doc_id, c.* FROM _udtf_edge d, LATERAL chunk_text(d.text) c"
    ).collect()
    # null and empty text yield no chunks; the short doc yields one
    assert [(r.doc_id, r.chunk_id, r.chunk_tokens) for r in rows] == [
        (3, 0, 2)
    ]


def test_parameterized_sql_named_args(spark):
    """Spark 4 named-parameter SQL (the injection-safe front door): the
    same template re-executes with different bindings."""
    spark.range(50).selectExpr("id", "id % 5 AS k").createOrReplaceTempView(
        "_param_t"
    )
    tpl = "SELECT COUNT(*) AS n FROM _param_t WHERE k = :k AND id >= :lo"
    n0 = spark.sql(tpl, args={"k": 0, "lo": 0}).collect()[0].n
    n1 = spark.sql(tpl, args={"k": 0, "lo": 25}).collect()[0].n
    assert n0 == 10 and n1 == 5


def test_parameterized_sql_positional_args(spark):
    df = spark.sql("SELECT ? + ? AS s", args=[2, 3])
    assert df.collect()[0].s == 5


def test_collation_case_insensitive_compare(spark):
    """Spark 4 collation surface: UTF8_LCASE comparisons and grouping."""
    df = spark.createDataFrame(
        [("Apple",), ("APPLE",), ("banana",), ("Banana",), ("cherry",)],
        "fruit string",
    )
    df.createOrReplaceTempView("_coll_t")
    rows = spark.sql(
        """
        SELECT lower(fruit COLLATE UTF8_LCASE) AS f, COUNT(*) AS n
        FROM _coll_t GROUP BY fruit COLLATE UTF8_LCASE
        """
    ).collect()
    assert sorted((r.f, r.n) for r in rows) == [
        ("apple", 2),
        ("banana", 2),
        ("cherry", 1),
    ]


def test_try_arithmetic_is_null_safe_under_ansi(spark):
    """ANSI mode makes 1/0 raise; the try_ family returns NULL instead —
    the error-safe path pipelines use for ratio columns."""
    row = spark.sql(
        "SELECT try_divide(10, 0) AS a, try_add(9223372036854775807, 1) AS b,"
        " try_cast('xyz' AS INT) AS c"
    ).collect()[0]
    assert row.a is None and row.b is None and row.c is None


def test_sql_scalar_udf_create_function(spark):
    """Spark 4 SQL scalar UDFs (CREATE FUNCTION ... RETURN expr): declared
    in SQL, inlined by Catalyst — the user-extensibility path that stays
    fully JVM-side."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_revenue(p DOUBLE, d DOUBLE)"
        " RETURNS DOUBLE RETURN p * (1 - d)"
    )
    row = spark.sql(
        "SELECT net_revenue(100.0, 0.25) AS r,"
        " net_revenue(0.0, 0.5) AS z"
    ).collect()[0]
    assert row.r == 75.0 and row.z == 0.0
    # usable over a table, composed with aggregation
    spark.range(4).selectExpr(
        "CAST(id AS DOUBLE) * 10 AS p", "0.1 AS d"
    ).createOrReplaceTempView("_udf_rows")
    got = spark.sql(
        "SELECT CAST(SUM(net_revenue(p, d)) AS DOUBLE) AS s FROM _udf_rows"
    ).collect()[0].s
    assert got == (0 + 10 + 20 + 30) * 0.9


def test_map_in_arrow_batch_processing(spark):
    """mapInArrow: the zero-copy Arrow-native sibling of mapInPandas —
    batches arrive as pyarrow.RecordBatch, letting numpy/pyarrow kernels
    run without pandas conversion overhead."""
    import pyarrow as pa

    df = spark.range(1000).selectExpr("id", "id % 7 AS k")

    def double_k(batches):
        for batch in batches:
            t = batch.to_pydict()
            yield pa.RecordBatch.from_pydict(
                {"id": t["id"], "k2": [v * 2 for v in t["k"]]}
            )

    out = df.mapInArrow(double_k, schema="id long, k2 long")
    rows = {r.id: r.k2 for r in out.collect()}
    assert len(rows) == 1000
    assert all(rows[i] == (i % 7) * 2 for i in range(1000))
