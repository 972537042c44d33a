import sys, time
sys.path.insert(0,'/root/repo')
from pyspark.sql import functions as F
from msstreamingstack_spark.session import get_spark
from msstreamingstack_spark.queries import REGISTRY
from msstreamingstack_spark.sources.tables import load_table
from msstreamingstack_spark.queries_analytics import (
    _basket_pairs_from_arrays, _basket_lift_tail, BASKET_MIN_SUPPORT)

spark = get_spark(app_name="basket-ab")
spark.sparkContext.setLogLevel("ERROR")
SF = "/tmp/msstream_scale_64x"

def old_form(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
          .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
          .distinct())
    n = ob.select("okey").distinct().agg(F.count("*").alias("n_orders"))
    bc = ob.groupBy("brand").agg(F.count("*").alias("n_b"))
    pairs = (ob.alias("a")
             .join(ob.alias("b").hint("shuffle_hash"), "okey")
             .filter(F.col("a.brand") < F.col("b.brand"))
             .groupBy(F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b"))
             .agg(F.count("*").alias("n_ab"))
             .filter(F.col("n_ab") >= BASKET_MIN_SUPPORT))
    return _basket_lift_tail(pairs, bc, n)

def timed(fn, label, reps=3):
    times=[]
    for _ in range(reps):
        t0=time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter()-t0,2))
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    print(label, times, flush=True)

timed(lambda: REGISTRY["tpch_q1"].builder(spark, SF), "q1        ")
timed(lambda: old_form(spark, SF), "old selfjoin")
timed(lambda: REGISTRY["basket_lift_pairs"].builder(spark, SF), "new array  ")
timed(lambda: REGISTRY["basket_lift_pairs_capped"].builder(spark, SF), "new capped ")
