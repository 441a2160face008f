#!/bin/bash
# launch_guard.sh <lock-name> <log-prefix> -- <command...>
#
# Collision-safe launcher for long experiment runs (round-4 ADVICE: a
# duplicate runner sharing a fixed `> out` redirect truncated a completed
# cell's log — results/ab_sweep_r4/c2_s1). Two guards:
#   * an exclusive flock on /tmp/<lock-name>.lock — a second launcher with
#     the same lock name exits loudly instead of double-running,
#   * a UNIQUE attempt-numbered log (<log-prefix>.attemptN.out) — reruns
#     never truncate a previous attempt's output.
# Prints the chosen log path, runs the command with stdout+stderr there.
set -eu
lock_name=$1; log_prefix=$2
[ "$3" = "--" ] || { echo "usage: launch_guard.sh <lock> <logprefix> -- cmd..." >&2; exit 2; }
shift 3

n=1
while [ -e "${log_prefix}.attempt${n}.out" ]; do n=$((n + 1)); done
log="${log_prefix}.attempt${n}.out"

exec 9>"/tmp/${lock_name}.lock"
if ! flock -n 9; then
  echo "launch_guard: '${lock_name}' already running (lock held) — refusing duplicate launch" >&2
  exit 3
fi
echo "launch_guard: logging to ${log}"
"$@" >"$log" 2>&1
