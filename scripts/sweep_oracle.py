"""Driver-mimic: run EVERY queries() entry with an oracle at sf0.01."""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import ray

ray.init(address="local", num_cpus=12, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

from compare_util import compare
from the_yelp_collaborative_knowledge_graph_ray import queries as Q

SF_DIR = "/root/testdata/sf0.01"
qs = Q.queries()
sqls = Q.oracle_sql()
names = sorted(set(qs) & set(sqls))
only = sys.argv[1:]
if only:
    names = [n for n in names if n in only]

results = {}
t_all = time.time()
for i, name in enumerate(names):
    t0 = time.time()
    try:
        ok, msg = compare(qs[name](SF_DIR), sqls[name], SF_DIR)
    except Exception as e:
        ok, msg = False, f"EXC {type(e).__name__}: {e}"
        traceback.print_exc()
    dt = time.time() - t0
    results[name] = {"ok": ok, "msg": msg if not ok else "", "sec": round(dt, 2)}
    print(f"[{i+1}/{len(names)}] {'PASS' if ok else 'FAIL'} {name} "
          f"({dt:.1f}s){'' if ok else ' :: ' + msg}", flush=True)

bad = {k: v for k, v in results.items() if not v["ok"]}
print(f"\nTOTAL {len(names)} queries, {len(bad)} failures, "
      f"{time.time()-t_all:.0f}s")
with open("/tmp/sweep_sf001_results.json", "w") as f:
    json.dump(results, f, indent=1)
if bad:
    print(json.dumps(bad, indent=1))
ray.shutdown()
