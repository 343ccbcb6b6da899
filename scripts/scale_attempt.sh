#!/bin/bash
# Gated scaling attempt: probe the box's memory-bandwidth scaling envelope
# first (the job is bandwidth-bound at 32 threads), and only burn a full
# benchmark run when the envelope is open. Appends results to
# /tmp/scaling_attempts.jsonl either way.
#
# The probe measures the SAME (N, 4N) pair bench_scaling.py will run
# (SPARK_GRAFT_SCALING_N, default 2 -> pair 2 vs 8), so the gate's
# envelope matches the gated run's (ADVICE r3: it previously hardcoded
# 8 vs 32 regardless of N).
set -u
N=${SPARK_GRAFT_SCALING_N:-2}
LOAD=$(cut -d' ' -f1 /proc/loadavg)
PROBE=$(SCALE_N="$N" python3 - <<'EOF'
import json, os, subprocess, sys, tempfile
copy_src = ("import time,numpy as np\n"
            "a=np.ones(8*1024*1024);b=np.empty_like(a)\n"
            "t0=time.time();n=0\n"
            "while time.time()-t0<2:\n"
            "    np.copyto(b,a);n+=1\n"
            "print(n)\n")
fp = tempfile.NamedTemporaryFile('w', suffix='.py', delete=False)
fp.write(copy_src); fp.close()
lo = int(os.environ["SCALE_N"]); hi = 4 * lo
agg = {}
for n in (lo, hi):
    procs = [subprocess.Popen([sys.executable, fp.name], stdout=subprocess.PIPE)
             for _ in range(n)]
    agg[n] = sum(int(p.communicate()[0]) for p in procs)
os.unlink(fp.name)
print(json.dumps({"membw_eff": round(agg[hi]/agg[lo]/4.0, 3),
                  "pair": [lo, hi],
                  f"agg{lo}": agg[lo], f"agg{hi}": agg[hi]}))
EOF
)
EFF=$(echo "$PROBE" | tail -1 | python3 -c "import json,sys; print(json.load(sys.stdin)['membw_eff'])")
echo "{\"probe\": $(echo "$PROBE" | tail -1), \"load\": $LOAD}" >> /tmp/scaling_attempts.jsonl
# upper bound too: eff >> 1 means the small-N probe itself was starved
# by a neighbor burst (observed 83.6 when agg_small ~ 0) — not a quiet
# window, a broken measurement
GATE=$(python3 -c "print(1 if ${GATE_MIN:-0.75} <= float('$EFF') <= ${GATE_MAX:-1.15} and float('$LOAD') < ${LOAD_MAX:-4.0} else 0)")
if [ "$GATE" = "1" ]; then
  echo "GATE OPEN membw_eff=$EFF load=$LOAD pair=($N,$((4*N))) — running"
  SPARK_GRAFT_SCALING_N="$N" \
  SPARK_GRAFT_SCALING_MULT=${SPARK_GRAFT_SCALING_MULT:-384} \
  SPARK_GRAFT_SCALING_REPEATS=${SPARK_GRAFT_SCALING_REPEATS:-3} \
    python scripts/bench_scaling.py 2>/dev/null | grep -E '^\{' | tail -1 \
    | tee -a /tmp/scaling_attempts.jsonl
else
  echo "GATE CLOSED membw_eff=$EFF load=$LOAD pair=($N,$((4*N)))"
fi
