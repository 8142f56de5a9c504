"""Dedicated solo best-of-3 pins for the recurring sub-2s bench
offenders (VERDICT r12 item 5): each query timed in its OWN process
sequence, idle host, engine session, sf0.1, with the three
calibration probes recorded for window context."""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
import bench
from flight_data_pipeline_spark.session import get_spark
import __spark_entry__ as entrymod

TARGETS = sys.argv[1:] or [
    "curated_training_mix", "dup_span_removal",
    "kmeans_assignment_round", "distinct_token_sketches",
    "token_stats_by_lang"]
SF_DIR = "/root/testdata/sf0.1"

spark = get_spark(app_name="fdps-solo-pin")
spark.sparkContext.setLogLevel("ERROR")
queries = entrymod.queries()

def run(df):
    df.write.format("noop").mode("overwrite").save()

# same warmup family as bench.py
for warm in ("scalar_counts", "tokenization_stats", "label_centroid_stats"):
    run(queries[warm](spark, SF_DIR))

cal = bench.calibration_sec(spark)
mem = bench.calibration_mem_sec()
sched = bench.calibration_sched_sec(spark)

out = {"cal_cpu_sec": round(cal, 4), "cal_mem_sec": round(mem, 4),
       "cal_sched_sec": round(sched, 4), "pins": {}}
for name in TARGETS:
    times = []
    for _ in range(3):
        t0 = time.time()
        run(queries[name](spark, SF_DIR))
        times.append(round(time.time() - t0, 3))
    out["pins"][name] = {"best": min(times), "runs": times}
print(json.dumps(out))
