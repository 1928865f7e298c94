"""Scratch: find an aggregation recipe where Spark and DuckDB agree bit-exactly."""

import duckdb
from pyspark.sql import functions as F

from finance_etl_spark.session import get_spark

SF = "/root/testdata/sf0.01"

spark = get_spark("float-exp", shuffle_partitions=8)
li = spark.read.parquet(f"{SF}/lineitem.parquet")

con = duckdb.connect()
con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')")

# Recipe A: plain double sum
a_spark = {
    r["l_returnflag"]: r["s"]
    for r in li.groupBy("l_returnflag").agg(F.sum("l_extendedprice").alias("s")).collect()
}
a_duck = dict(con.execute("SELECT l_returnflag, sum(l_extendedprice) FROM lineitem GROUP BY 1").fetchall())

# Recipe B: decimal(30,10) sum cast back to double
b_spark = {
    r["l_returnflag"]: r["s"]
    for r in li.groupBy("l_returnflag")
    .agg(F.sum(F.col("l_extendedprice").cast("decimal(30,10)")).cast("double").alias("s"))
    .collect()
}
b_duck = dict(
    con.execute(
        "SELECT l_returnflag, CAST(sum(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE) FROM lineitem GROUP BY 1"
    ).fetchall()
)

# Recipe C: round(sum, 2)
c_spark = {
    r["l_returnflag"]: r["s"]
    for r in li.groupBy("l_returnflag").agg(F.round(F.sum("l_extendedprice"), 2).alias("s")).collect()
}
c_duck = dict(con.execute("SELECT l_returnflag, round(sum(l_extendedprice),2) FROM lineitem GROUP BY 1").fetchall())

# Recipe D: avg as decimal-sum/count double division
d_spark = {
    r["l_returnflag"]: r["s"]
    for r in li.groupBy("l_returnflag")
    .agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(30,10)")).cast("double") / F.count("l_extendedprice")).alias("s")
    )
    .collect()
}
d_duck = dict(
    con.execute(
        "SELECT l_returnflag, CAST(sum(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE)/count(l_extendedprice) FROM lineitem GROUP BY 1"
    ).fetchall()
)

# Recipe E: product expression sum in decimal (revenue = price*(1-disc))
e_spark = {
    r["l_returnflag"]: r["s"]
    for r in li.groupBy("l_returnflag")
    .agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,10)"))
        .cast("double")
        .alias("s")
    )
    .collect()
}
e_duck = dict(
    con.execute(
        "SELECT l_returnflag, CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,10))) AS DOUBLE) FROM lineitem GROUP BY 1"
    ).fetchall()
)

for name, s, d in [("A double-sum", a_spark, a_duck), ("B dec-sum", b_spark, b_duck),
                   ("C round2", c_spark, c_duck), ("D avg", d_spark, d_duck),
                   ("E expr-dec-sum", e_spark, e_duck)]:
    exact = all(s[k] == d[k] for k in s)
    print(name, "EXACT" if exact else "DIFF", {k: (s[k], d[k]) for k in s if s[k] != d[k]})

spark.stop()
