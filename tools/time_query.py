"""Quick per-query timer: python tools/time_query.py q1 q2 ... [--sf dir]"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as ent
from imdb_metacritic_data_warehouse_spark.session import get_spark

args = [a for a in sys.argv[1:] if not a.startswith("--")]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("timeq")
qs = ent.queries()
for name in args:
    # warm-up + best-of-2, same protocol as bench.py
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best or 1e9, time.perf_counter() - t0)
    print(f"{name}: {best:.3f}s")
spark.stop()
