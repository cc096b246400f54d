# Shared retry/marker discipline for the serial TPU measurement queues.
# The axon tunnel oscillates on a minutes scale (and was hard-down for
# hours late round 3), so every leg retries with a pause, and completed
# legs drop a marker file so re-running a whole queue skips them (safe to
# loop until drained). The tunnel is single-tenant: strictly one TPU
# process at a time — chain queues, never overlap them.
#
# Usage (from a queue script, after setting the knobs):
#   LOG=/tmp/foo.log DONE_DIR=/tmp/foo_done TRIES=5 PAUSE=240
#   mkdir -p "$DONE_DIR"
#   . "$(dirname "$0")/tpu_queue_lib.sh"
#   run <name> <timeout_s> <cmd...>
#   check_drained <LABEL> <marker>...   # exits 1 if any marker missing

run() {
  # run <name> <timeout> <cmd...>: retry across tunnel flaps; marker on ok
  local name="$1" tmo="$2"; shift 2
  if [ -e "$DONE_DIR/$name" ]; then
    echo "=== $name: already done, skipping ===" | tee -a "$LOG"
    return 0
  fi
  local rc=1
  for attempt in $(seq 1 "$TRIES"); do
    echo "=== $name attempt $attempt ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
    timeout -k 30 "$tmo" "$@" >>"$LOG" 2>&1
    rc=$?
    echo "--- $name attempt $attempt exit=$rc ---" | tee -a "$LOG"
    [ $rc -eq 0 ] && { touch "$DONE_DIR/$name"; return 0; }
    [ "$attempt" -lt "$TRIES" ] && sleep "$PAUSE"
  done
  return $rc
}

check_drained() {
  # check_drained <LABEL> <marker>... — the marker list is the queue's
  # completeness contract: EVERY leg the script runs must be named here,
  # or a silently-failed leg still prints "FULLY DRAINED" (this bit the
  # r4 queue: its list omitted hw_tests).
  local label="$1"; shift
  local missing=0 m
  for m in "$@"; do
    [ -e "$DONE_DIR/$m" ] || { echo "MISSING: $m" | tee -a "$LOG"; missing=1; }
  done
  if [ $missing -eq 0 ]; then
    echo "$label QUEUE FULLY DRAINED — results in $LOG" | tee -a "$LOG"
  else
    echo "$label QUEUE INCOMPLETE — re-run to retry missing legs" | tee -a "$LOG"
    exit 1
  fi
}
