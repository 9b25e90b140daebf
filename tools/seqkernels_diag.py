"""seq_kernels N->4N efficiency decomposition (r5 verdict item 4).

Times three nested slices of the seq_kernels query at local[4] and
local[16] on the 1.92M-sequence corpus, fenced, in fresh JVMs per
parallelism (subprocess), to pin WHERE the 0.54-0.63 raw efficiency
lives: scalar scan (no arrays), array decode (read times, no kernel),
full kernel (iat + iat_size + pad).

Usage: python tools/seqkernels_diag.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LEG_CODE = r"""
import sys, time, json
sys.path.insert(0, %(repo)r)
from netml_spark.session import get_spark
from pyspark.sql import functions as F
from netml_spark.operators import kernels

cpus = %(cpus)d
spark = get_spark("seqdiag", master=f"local[{cpus}]", shuffle_partitions=64)
seqs = spark.read.parquet(%(repo)r + "/BENCH/sequences_1920000")

def scalar_scan():
    return seqs.agg(F.sum("n_tok").alias("c"))

def array_decode():
    return seqs.agg(F.sum(F.element_at("times", 1) + F.element_at("tokens", 1)).alias("c"))

def full_kernel():
    out = seqs.select(
        kernels.pad_truncate(kernels.iat("times"), 63).alias("f1"),
        kernels.pad_truncate(kernels.iat_size("times", "tokens"), 127).alias("f2"),
    )
    return out.agg(F.sum(F.element_at("f1", 1) + F.element_at("f2", 1)).alias("c"))

out = {}
for name, fn in (("scalar_scan", scalar_scan), ("array_decode", array_decode),
                 ("full_kernel", full_kernel)):
    fn().collect()
    best = None
    for _ in range(2):
        t0 = time.time(); fn().collect()
        best = min(best or 1e9, time.time() - t0)
    out[name] = round(best, 3)
print("RESULT " + json.dumps({"cpus": cpus, "legs": out}))
spark.stop()
"""


def run_leg(cpus: int):
    code = LEG_CODE % {"repo": REPO, "cpus": cpus}
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=3600)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    print(r.stderr[-1500:], file=sys.stderr)
    raise RuntimeError(f"leg local[{cpus}] failed rc={r.returncode}")


def main():
    a = run_leg(4)
    b = run_leg(16)
    effs = {k: round(a["legs"][k] / (4 * b["legs"][k]), 3) for k in a["legs"]}
    print(json.dumps({"local4": a["legs"], "local16": b["legs"],
                      "raw_efficiency": effs}))


if __name__ == "__main__":
    main()
