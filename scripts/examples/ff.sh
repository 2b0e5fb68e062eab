#!/usr/bin/env bash
# Simple feed-forward example (reference: scripts/examples/ff.sh)
source "$(dirname "$0")/../common.sh"
$MASTER "${TIMIT_ARGS[@]}" --output-dir example_out --output-id example_ff \
    "--network-spec=-n ff -l 8 -u 2048 -a relu --splice 5 -d 0.2"
