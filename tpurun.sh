#!/bin/bash
# Run a TPU command with retries around the tunnel's claim-recycle window.
# The axon PJRT plugin can only claim the chip at interpreter start; for a
# short window after another python process exits, the claim fails and the
# CLI exits with EX_TEMPFAIL (75). Retry until it sticks.
tries=${TPURUN_TRIES:-6}
for i in $(seq 1 "$tries"); do
  "$@"
  rc=$?
  [ "$rc" != 75 ] && exit "$rc"
  echo "[tpurun] TPU claim failed (attempt $i/$tries); waiting 45s" >&2
  sleep 45
done
exit 75
