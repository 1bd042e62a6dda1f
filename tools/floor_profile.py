"""Phase ledger for the bench latency floor: where do the ~0.3s/query go?

Times, for each floor query, steady-state (after 3 warm passes):
  construct  = python+py4j time building the DataFrame
  write      = noop write total (the bench's timed region)
  jobs_wall  = sum of (job completion - submission) from the status store
  gap        = write - jobs_wall  (driver-side analysis/planning/commit + py4j)
  py4j_n/s   = py4j send_command round trips and their wall during the region
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import py4j.clientserver, py4j.java_gateway

# count py4j round trips
_stats = {"n": 0, "t": 0.0}
for _cls in (py4j.clientserver.ClientServerConnection, py4j.java_gateway.GatewayConnection):
    if hasattr(_cls, "send_command"):
        _orig = _cls.send_command
        def _wrap(self, *a, __orig=_orig, **k):
            t0 = time.monotonic()
            try:
                return __orig(self, *a, **k)
            finally:
                _stats["n"] += 1
                _stats["t"] += time.monotonic() - t0
        _cls.send_command = _wrap

import importlib.util
spec = importlib.util.spec_from_file_location("e", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py"))
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
from bergloom_spark.session import get_spark

CPUS = int(os.environ.get("PROF_CPUS", "32"))
sf = os.environ.get("PROF_SF", "/root/testdata/sf0.1")
spark = get_spark(app_name="floor-prof", cpus=CPUS)
spark.sparkContext.setLogLevel("ERROR")
q = dict(m.queries())
q.setdefault("bpe_pipeline_fast", m.q_bpe_pipeline_fast)

NAMES = sys.argv[1:] or ["events_hourly", "q1_pricing_summary", "dedup_fingerprint", "asof_purchase_view"]

sc = spark.sparkContext
jvm = spark.sparkContext._jvm
store = spark.sparkContext._jsc.sc().statusStore()

def _jobs():
    lst = store.jobsList(jvm.java.util.ArrayList())
    out = []
    it = lst.iterator()
    while it.hasNext():
        out.append(it.next())
    return out

def job_ids():
    return {j.jobId() for j in _jobs()}

def jobs_wall(new_ids):
    tot = 0.0; n = 0
    for j in _jobs():
        if j.jobId() in new_ids:
            try:
                sub = j.submissionTime().get().getTime()
                comp = j.completionTime().get().getTime()
                tot += (comp - sub) / 1000.0; n += 1
            except Exception:
                pass
    return n, tot

for name in NAMES:
    fn = q[name]
    # warm passes
    for _ in range(3):
        fn(spark, sf).write.format("noop").mode("overwrite").save()
    rows = []
    for _ in range(5):
        pre_ids = job_ids()
        n0, t0p = _stats["n"], _stats["t"]
        t0 = time.monotonic()
        df = fn(spark, sf)
        t1 = time.monotonic()
        n1, t1p = _stats["n"], _stats["t"]
        df.write.format("noop").mode("overwrite").save()
        t2 = time.monotonic()
        n2, t2p = _stats["n"], _stats["t"]
        new = job_ids() - pre_ids
        nj, jw = jobs_wall(new)
        rows.append({
            "construct": round(t1 - t0, 4),
            "write": round(t2 - t1, 4),
            "n_jobs": nj,
            "jobs_wall": round(jw, 4),
            "gap": round((t2 - t1) - jw, 4),
            "py4j_construct_n": n1 - n0,
            "py4j_construct_s": round(t1p - t0p, 4),
            "py4j_write_n": n2 - n1,
            "py4j_write_s": round(t2p - t1p, 4),
        })
    best = min(rows, key=lambda r: r["construct"] + r["write"])
    print(name, json.dumps(best))
spark.stop()
