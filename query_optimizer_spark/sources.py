"""Sources & sinks beyond plain parquet reads.

The reference's only source is a JDBC catalog and its sinks are JSON/ser
files (SURVEY.md §2.1).  A Spark engine needs the full ingest/egress
surface; this module adds the pieces with scale-relevant behavior:

- multi-format readers with explicit schemas (no inference jobs at scale),
- partitioned parquet sinks (hive-style directory pruning),
- bucketed tables for co-located, shuffle-free joins (the 100 TB answer
  to repeated large-large joins on the same key).

All writes stay inside the repo tree (``.warehouse/`` by default).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

DEFAULT_WAREHOUSE = "/root/repo/.warehouse"


def read_any(spark: SparkSession, path: str, fmt: str, schema=None) -> DataFrame:
    """Schema-explicit multi-format reader (csv/json/parquet/orc).
    Schema inference is a full extra pass over the data -- never at scale."""
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.load(path)


def write_partitioned(
    df: DataFrame, path: str, partition_by: list[str], fmt: str = "parquet"
) -> None:
    """Hive-style partitioned sink: readers filtering on the partition
    columns prune whole directories (visible as PartitionFilters in the
    read plan)."""
    df.write.format(fmt).mode("overwrite").partitionBy(*partition_by).save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str | list[str],
    n_buckets: int = 8,
    sort_by: str | list[str] | None = None,
) -> None:
    """Bucketed managed table: rows are hash-partitioned into fixed
    buckets at WRITE time, so two tables bucketed the same way join with
    NO exchange at read time -- the co-location strategy for repeated
    large-large joins (pre-shuffle once, join many times)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a stale managed-table directory from a previous session blocks
    # saveAsTable even in overwrite mode (LOCATION_ALREADY_EXISTS)
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    import shutil

    shutil.rmtree(Path(warehouse) / table.lower(), ignore_errors=True)
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *cols)
    if sort_by:
        s = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*s)
    w.saveAsTable(table)


def bucketed_join_demo(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8
) -> tuple[DataFrame, str]:
    """Bucket lineitem + orders on the join key, join them, and return
    (result, physical plan).  The plan must contain no Exchange on
    either side -- asserted in tests."""
    Path(DEFAULT_WAREHOUSE).mkdir(exist_ok=True)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, "li_bucketed", "l_orderkey", n_buckets, "l_orderkey")
    write_bucketed(orders, "orders_bucketed", "o_orderkey", n_buckets, "o_orderkey")
    a = spark.table("li_bucketed")
    b = spark.table("orders_bucketed")
    # merge hint: broadcast would win on toy data, but sort-merge is the
    # strategy bucketing exists for (both sides pre-hashed + pre-sorted
    # => no Exchange, no Sort at read time)
    joined = a.hint("merge").join(b.hint("merge"), a.l_orderkey == b.o_orderkey, "inner")
    from .executor import physical_plan

    return joined, physical_plan(joined)


def bucketed_join_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated co-located join: lineitem and orders are written as
    bucketed managed tables hash-partitioned on the join key, then
    sort-merge joined with NO Exchange on either side (asserted on the
    physical plan inline -- a silent regression to shuffling would
    still return correct rows).  This is the pre-shuffle-once,
    join-many-times strategy for repeated large-large joins at 100 TB:
    the write pays the shuffle one time, every later join reads
    co-located, pre-sorted buckets.

    The output aggregates the join per orderkey residue class (16
    groups): the revenue sum goes through DECIMAL(18,2) so engine
    summation order cannot move the double result."""
    joined, plan = bucketed_join_demo(spark, sf_dir)
    assert "Exchange" not in plan, "bucketed join must not shuffle"
    from pyspark.sql import functions as F

    return (
        joined.groupBy(
            (F.col("l_orderkey") % 16).cast("int").alias("bucket")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("l_quantity").cast("bigint").alias("sum_qty"),
            F.expr(
                "cast(sum(cast(l_extendedprice as decimal(18, 2)))"
                " as double)"
            ).alias("revenue"),
        )
    )


def bucketed_join_gate_oracle() -> str:
    return """
        SELECT CAST(l_orderkey % 16 AS INT) AS bucket,
               count(*) AS n_rows,
               CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18, 2)))
                    AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
    """


def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL source/sink round-trip: write the documents table as JSON
    lines (the interchange format most raw training corpora arrive in),
    read it back through the JSON source with an EXPLICIT schema (schema
    inference is a full extra pass at 100 TB -- never rely on it), and
    project a fidelity record.  The DuckDB oracle reads the original
    parquet, so the hash match proves the round-trip is lossless.
    Corpus text is printable ASCII (asserted in tests), so JSON escaping
    is bijective here."""
    from pyspark.sql import functions as F

    import hashlib

    # tag by a hash of the full path, not just the basename, so two
    # sf_dirs with the same leaf name can't collide on the output dir
    tag = hashlib.md5(sf_dir.rstrip("/").encode()).hexdigest()[:12]
    out = f"{DEFAULT_WAREHOUSE}/documents_jsonl_{tag}"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs.write.mode("overwrite").json(out)
    back = spark.read.schema("doc_id bigint, text string").json(out)
    return back.select(
        "doc_id",
        F.length("text").cast("int").alias("n_chars"),
        F.expr("substring(text, 1, 40)").alias("prefix"),
    )


def jsonl_roundtrip_oracle() -> str:
    return """
        SELECT doc_id, CAST(length(text) AS INT) AS n_chars,
               substring(text, 1, 40) AS prefix
        FROM documents
    """


def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source/sink round-trip on the orders table: write with
    header, read back with an EXPLICIT schema (inference is an extra
    full pass at scale -- and silently types everything it can't parse
    as string), project a fidelity record.  The DuckDB oracle reads the
    original parquet, so a hash match proves numeric/string round-trip
    fidelity through the text format."""
    from pyspark.sql import functions as F

    import hashlib

    tag = hashlib.md5(sf_dir.rstrip("/").encode()).hexdigest()[:12]
    out = f"{DEFAULT_WAREHOUSE}/orders_csv_{tag}"
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    orders.write.mode("overwrite").option("header", "true").csv(out)
    back = (
        spark.read.schema(
            "o_orderkey bigint, o_custkey bigint, "
            "o_orderstatus string, o_totalprice double"
        )
        .option("header", "true")
        .csv(out)
    )
    return back.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.expr("round(o_totalprice, 3)").alias("price_r"),
    )


def csv_roundtrip_oracle() -> str:
    return """
        SELECT o_orderkey, o_custkey, o_orderstatus,
               round(o_totalprice, 3) AS price_r
        FROM orders
    """


def partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned sink/source round-trip: write documents
    partitioned by (lang), read back ONLY two partitions through a
    partition filter, and aggregate -- the layout every 100 TB corpus
    uses so per-language jobs touch 1/Nth of the data.  The read plan
    must show PartitionFilters (directory pruning, asserted in tests);
    the DuckDB oracle aggregates the original parquet with the same
    predicate, so the hash match proves the round-trip is lossless AND
    the pruned read is complete."""
    import hashlib

    from pyspark.sql import functions as F

    tag = hashlib.md5(sf_dir.rstrip("/").encode()).hexdigest()[:12]
    out = f"{DEFAULT_WAREHOUSE}/documents_bylang_{tag}"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source", "n_chars"
    )
    write_partitioned(docs, out, ["lang"])
    back = spark.read.parquet(out).filter(F.col("lang").isin("en", "fr"))
    return back.groupBy("lang", "source").agg(
        F.count("*").cast("int").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


def partitioned_roundtrip_oracle() -> str:
    return """
        SELECT lang, source, CAST(count(*) AS INT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               min(doc_id) AS min_doc, max(doc_id) AS max_doc
        FROM documents
        WHERE lang IN ('en', 'fr')
        GROUP BY lang, source
    """
