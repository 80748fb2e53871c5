"""Driver-simulation drive script (verification surface), run from any cwd."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .appName("driver-sim").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E

df = E.entry(spark)
rows = df.collect()
print("DRIVE entry rows:", len(rows), "schema:", df.schema.simpleString())
print("DRIVE entry sample:", [(r.space_category, r.access, r.n_images) for r in rows[:4]], "total:", sum(r.n_images for r in rows))

import duckdb
con = duckdb.connect()
con.execute("CREATE VIEW lineitem AS SELECT * FROM '/root/testdata/sf0.01/lineitem.parquet'")
s = E.queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.01").collect()
d = con.sql(E.oracle_sql()["q1_pricing_summary"]).fetchall()
print("DRIVE q1 spark rows:", len(s), "duck rows:", len(d))
print("DRIVE q1 spark first:", sorted([tuple(r) for r in s])[0])
print("DRIVE q1 duck  first:", sorted(d)[0])
s2 = E.queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.01").collect()
print("DRIVE q1 idempotent:", sorted(map(tuple, s)) == sorted(map(tuple, s2)))
s3 = E.queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001").collect()
print("DRIVE q1 sf0.001 rows:", len(s3))
try:
    E.queries()["q1_pricing_summary"](spark, "/root/testdata/nonexistent").collect()
    print("DRIVE bogus-dir: NO ERROR (!)")
except Exception as ex:
    print("DRIVE bogus-dir raises:", type(ex).__name__, str(ex).split("\n")[0][:80])
n = E.queries()["image_cell_histogram"](spark, "/root/testdata/sf0.01").count()
print("DRIVE cell histogram rows:", n)
spark.stop()
print("DRIVE done")
