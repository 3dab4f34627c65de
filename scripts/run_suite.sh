#!/usr/bin/env bash
# Run the full test suite chunked for 1-core hosts.
#
# The whole suite is ~30 min serial on one CPU core; two parallel pytest
# invocations thrash (every test file compiles XLA programs on an 8-device
# virtual CPU mesh). This script runs the suite in a few serial chunks so a
# failure localizes quickly and memory stays bounded, and exits non-zero if
# any chunk fails.
#
# Usage: scripts/run_suite.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."

CHUNKS=(
  # fast pure-function layers first
  "tests/test_ops.py tests/test_blocks.py tests/test_batchnorm.py tests/test_configs.py"
  "tests/test_data.py tests/test_native_io.py tests/test_logging.py"
  # golden parity vs torch (slowest single files)
  "tests/test_models.py"
  "tests/test_tasks.py tests/test_torch_checkpoint_file.py"
  # train/e2e/distributed
  "tests/test_train.py tests/test_frame_sharding.py"
  "tests/test_e2e.py tests/test_transfer_engine.py tests/test_device_feed.py"
  "tests/test_pallas.py tests/test_graft_entry.py tests/test_distributed.py"
)

# Coverage guard: every tests/test_*.py must appear in a chunk, so a new test
# file can never be silently skipped by this runner (the round-4 failure mode:
# test_device_feed.py existed but no chunk named it).
assigned=" ${CHUNKS[*]} "
unassigned=()
for f in tests/test_*.py; do
  case "$assigned" in
    *" $f "*) ;;
    *) unassigned+=("$f") ;;
  esac
done
if ((${#unassigned[@]})); then
  echo "=== pytest ${unassigned[*]} (not in any named chunk) ==="
  CHUNKS+=("${unassigned[*]}")
fi

rc=0
for chunk in "${CHUNKS[@]}"; do
  echo "=== pytest $chunk ==="
  # shellcheck disable=SC2086
  python -m pytest $chunk -q "$@" || rc=$?
done
exit $rc
