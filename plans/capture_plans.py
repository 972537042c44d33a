"""Capture .explain("formatted") for registered queries into plans/r12/."""
import sys, os
from msstreamingstack_spark.session import get_spark
from msstreamingstack_spark.queries import REGISTRY

suffix = sys.argv[1]           # "before" or "after"
names = sys.argv[2].split(",") if len(sys.argv) > 2 else sorted(REGISTRY)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="capture-plans")
os.makedirs("plans/r12", exist_ok=True)
for n in names:
    df = REGISTRY[n].builder(spark, sf_dir)
    p = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    with open(f"plans/r12/{n}_{suffix}.txt", "w") as f:
        f.write(p)
    print(n, "ok")
spark.stop()
