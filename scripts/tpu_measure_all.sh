#!/bin/bash
# Full TPU measurement sequence for a round: stage probes + bench.
# Run when the axon tunnel is up (port 8082). Logs under /tmp/tpu_r2/.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_r2
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

if ! timeout 2 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; then
    echo "tunnel DOWN - aborting" >&2
    exit 1
fi

echo "=== banded stage probe ==="
timeout 1200 python scripts/probe_banded_stages.py 16 16000 1800 \
    2>&1 | tee /tmp/tpu_r2/banded_stages.log

echo "=== NTC pallas stage probe ==="
timeout 2400 python scripts/probe_ntc_pallas_stages.py 16000 1800 \
    2>&1 | tee /tmp/tpu_r2/ntc_stages.log

echo "=== bench ==="
timeout 3600 python bench.py 2>&1 | tee /tmp/tpu_r2/bench.log

echo "done; logs in /tmp/tpu_r2/"
