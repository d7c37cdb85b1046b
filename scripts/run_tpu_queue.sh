#!/usr/bin/env bash
# Run the queued TPU measurements (2026-08-18 axon-outage backlog) in one go.
#
# Each step is independent; a failure logs and continues so one flaky compile
# doesn't strand the rest of the queue. Suite steps merge rows into
# BENCH_SUITE.json in place (scripts/bench_suite.py --merge). After this
# finishes, sync docs/QUANTIZATION.md + README tables to the fresh rows and
# delete any one-off citations the new rows supersede.
#
# Usage:  PYTHONPATH=/root/.axon_site bash scripts/run_tpu_queue.sh
# (append /root/.axon_site if PYTHONPATH is already set — CLAUDE.md.)
set -u
cd "$(dirname "$0")/.."
case ":${PYTHONPATH:-}:" in
  *:/root/.axon_site:*) ;;  # already present
  *) export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/.axon_site" ;;
esac
LOG=${TPU_QUEUE_LOG:-/tmp/tpu_queue.log}
: >"$LOG"

step() {
  echo "=== $* ===" | tee -a "$LOG"
  "$@" >>"$LOG" 2>&1 || echo "FAILED (continuing): $*" | tee -a "$LOG"
}

# 0. tunnel probe — bail early (without wedging) if the backend is down.
# timeout-bounded: a wedged tunnel hangs jax.devices() forever inside the
# plugin client init, so an unbounded probe would hang the whole queue.
timeout 600 python - <<'EOF' || { echo "axon backend unavailable — queue not run"; exit 1; }
import jax
assert any(d.platform == "tpu" for d in jax.devices()), jax.devices()
print("tunnel OK:", jax.devices())
EOF

# 1. headline bf16 validation after the static-fold refactor (~4986 pruned)
step python bench.py
# 2. static int8 validation (~6405 pruned)
step env RAJNI_BENCH_QUANT=1 RAJNI_BENCH_CALIBRATE=1 python bench.py
# 3. ViT-H/14 routing-probe rows (bf16 / int8 / int8-static)
step python scripts/bench_suite.py --only vit_h14 --merge BENCH_SUITE.json
# 4. ViT-B/384 int8 rows (dynamic + static)
step python scripts/bench_suite.py --only vit_b16_384_int8 --merge BENCH_SUITE.json
# 5. re-measure ViT-B int8 rows (stock static row predates the
#    vector-operand fold rework — docs/QUANTIZATION.md footnote)
step python scripts/bench_suite.py --only vit_b16_schedulejson_int8 --merge BENCH_SUITE.json
# 6. first training-step throughput rows (fwd+bwd+adamw, bf16 batch 128)
step python scripts/bench_train.py --out BENCH_TRAIN.json

echo "queue done — full log at $LOG"
grep -h '"config"\|"metric"' "$LOG" | tail -20
