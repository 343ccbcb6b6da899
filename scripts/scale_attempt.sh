#!/bin/bash
# Gated scaling attempt: probe the box's memory-bandwidth scaling envelope
# first (the job is bandwidth-bound at 32 threads), and only burn a full
# benchmark run when the envelope is open. Appends results to
# /tmp/scaling_attempts.jsonl either way.
set -u
LOAD=$(cut -d' ' -f1 /proc/loadavg)
PROBE=$(python3 - <<'EOF'
import json, subprocess, sys, tempfile, os
copy_src = ("import time,numpy as np\n"
            "a=np.ones(8*1024*1024);b=np.empty_like(a)\n"
            "t0=time.time();n=0\n"
            "while time.time()-t0<2:\n"
            "    np.copyto(b,a);n+=1\n"
            "print(n)\n")
fp = tempfile.NamedTemporaryFile('w', suffix='.py', delete=False)
fp.write(copy_src); fp.close()
agg = {}
for n in (8, 32):
    procs = [subprocess.Popen([sys.executable, fp.name], stdout=subprocess.PIPE)
             for _ in range(n)]
    agg[n] = sum(int(p.communicate()[0]) for p in procs)
os.unlink(fp.name)
print(json.dumps({"membw_eff": round(agg[32]/agg[8]/4.0, 3),
                  "agg8": agg[8], "agg32": agg[32]}))
EOF
)
EFF=$(echo "$PROBE" | tail -1 | python3 -c "import json,sys; print(json.load(sys.stdin)['membw_eff'])")
echo "{\"probe\": $(echo "$PROBE" | tail -1), \"load\": $LOAD}" >> /tmp/scaling_attempts.jsonl
GATE=$(python3 -c "print(1 if float('$EFF') >= ${GATE_MIN:-0.75} and float('$LOAD') < ${LOAD_MAX:-4.0} else 0)")
if [ "$GATE" = "1" ]; then
  echo "GATE OPEN membw_eff=$EFF load=$LOAD — running"
  SPARK_GRAFT_SCALING_MULT=384 SPARK_GRAFT_SCALING_REPEATS=3 \
    python scripts/bench_scaling.py 2>/dev/null | grep -E '^\{' | tail -1 \
    | tee -a /tmp/scaling_attempts.jsonl
else
  echo "GATE CLOSED membw_eff=$EFF load=$LOAD"
fi
