import os, sys, json, time
os.chdir("/root/repo"); sys.path.insert(0, "/root/repo")
import bench
from transformio_spark.plans.session import build_session

sf_dir = "/root/testdata/sf0.1"
spark = build_session(app_name="probe-setup", cores=32)
spark.sparkContext.setLogLevel("ERROR")
bench._CANARY_PTS_PATH = bench._points_table_path(spark, sf_dir)
t0 = time.perf_counter()
docs_path = bench.materialize_scale_corpus(spark, sf_dir, factor=64)
print("materialize64:", round(time.perf_counter()-t0,1), "s", flush=True)
spark.stop()
res = bench.scaling_pairings(sf_dir, docs_path, quiet=True)
print(json.dumps(res), flush=True)
