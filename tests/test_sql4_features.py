"""Spark-4 SQL surface pins: session variables, parameterized SQL
(named args + EXECUTE IMMEDIATE ... USING), and SQL scripting
(BEGIN/END compounds with control flow) — the injection-safe
parameterization paths a SQL-facing service should use instead of
string interpolation, exercised against real engine queries."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_session_variables_drive_a_real_filter(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 10).alias("bucket")
    )
    df.createOrReplaceTempView("sv_rows")
    spark.sql("DECLARE OR REPLACE VARIABLE min_bucket INT DEFAULT 0")
    spark.sql("SET VAR min_bucket = 7")
    got = spark.sql(
        "SELECT COUNT(*) AS n FROM sv_rows WHERE bucket >= min_bucket"
    ).collect()[0]
    assert got.n == 30  # buckets 7, 8, 9
    # variables update like state, views see the new value immediately
    spark.sql("SET VAR min_bucket = 9")
    assert (
        spark.sql(
            "SELECT COUNT(*) AS n FROM sv_rows WHERE bucket >= min_bucket"
        ).collect()[0].n
        == 10
    )


def test_parameterized_sql_named_args(spark):
    spark.range(50).createOrReplaceTempView("pq_rows")
    got = spark.sql(
        "SELECT COUNT(*) AS n FROM pq_rows WHERE id BETWEEN :lo AND :hi",
        args={"lo": 10, "hi": 19},
    ).collect()[0]
    assert got.n == 10
    # strings bind as values, not SQL text (the injection-safety point)
    spark.createDataFrame(
        [("alice",), ("bob' OR '1'='1",)], "name string"
    ).createOrReplaceTempView("pq_names")
    hit = spark.sql(
        "SELECT COUNT(*) AS n FROM pq_names WHERE name = :n",
        args={"n": "bob' OR '1'='1"},
    ).collect()[0]
    assert hit.n == 1


def test_execute_immediate_with_using_binds(spark):
    spark.range(30).createOrReplaceTempView("ei_rows")
    spark.sql("DECLARE OR REPLACE VARIABLE ei_limit INT DEFAULT 3")
    got = spark.sql(
        "EXECUTE IMMEDIATE"
        " 'SELECT COUNT(*) AS n FROM ei_rows WHERE id < ?' USING 12"
    ).collect()[0]
    assert got.n == 12
    # INTO a session variable: the scripting-friendly result capture
    spark.sql(
        "EXECUTE IMMEDIATE 'SELECT MAX(id) FROM ei_rows' INTO ei_limit"
    )
    assert spark.sql("SELECT ei_limit AS v").collect()[0].v == 29


def test_sql_scripting_compound_with_control_flow(spark):
    rows = spark.sql(
        """
        BEGIN
          DECLARE total INT DEFAULT 0;
          DECLARE i INT DEFAULT 0;
          WHILE i < 5 DO
            SET i = i + 1;
            IF i % 2 = 1 THEN
              SET total = total + i;   -- 1 + 3 + 5
            END IF;
          END WHILE;
          SELECT total AS total;
        END
        """
    ).collect()
    assert rows[0].total == 9
