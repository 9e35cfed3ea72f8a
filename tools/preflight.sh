#!/bin/sh
# Pre-commit verification for this repo: compile + full test suite +
# the driver's own correctness gate (Verify at sf0.01 -> DuckDB oracle
# compare). On success, writes .preflight_green with a hash of the
# current source state; the prepare-commit-msg hook (tools/hooks/,
# installed via `git config core.hooksPath tools/hooks`) compares that
# stamp at commit time and appends a `Preflight: green|UNVERIFIED`
# trailer — so a snapshot commit carries its build health in the
# message instead of shipping a red build silently (the round-6
# failure mode).
set -e
cd "$(dirname "$0")/.."

# Hashes the verification-relevant state: HEAD, tracked modifications,
# and untracked files under src/ and tools/ (a new .scala file is
# invisible to `git diff HEAD` but very much part of what compile+test
# verified; tools/ is included so weakening the oracle comparator after
# a green run un-stamps it). Must stay identical to the computation in
# tools/hooks/prepare-commit-msg.
state_hash() {
    { git rev-parse HEAD
      git diff HEAD -- src build.sbt tools
      git ls-files -z -o --exclude-standard src build.sbt tools | sort -z | xargs -0 -r sha256sum
    } | sha256sum | cut -d' ' -f1
}

sbt -batch compile test
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/preflight_verify"
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/preflight_verify

state_hash > .preflight_green
echo "preflight: GREEN ($(cat .preflight_green))"
