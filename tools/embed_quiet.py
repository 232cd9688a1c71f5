"""r10 VERDICT #1: warm+quiet re-measure of q_embed_neardup.

One session; per sf_dir: one untimed warmup pass, then 3 timed passes
(noop write, same protocol as tools/sweep.py); report all + min.
Minimum-of-quiet-warm-runs is the only admissible evidence
(BASELINE.md r9 openvocab protocol).
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "16g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from trading_etl_python_spark.suite import QUERIES

out = {}
for sf_dir in sys.argv[1:]:
    q = QUERIES["q_embed_neardup"]
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warmup
    ts = []
    for _ in range(3):
        t0 = time.time()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts.append(round(time.time() - t0, 3))
    out[sf_dir] = {"runs": ts, "min": min(ts)}
    print(sf_dir, ts, flush=True)
print(json.dumps(out))
