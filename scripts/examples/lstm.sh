#!/usr/bin/env bash
# Simple LSTM example (reference: scripts/examples/lstm.sh)
source "$(dirname "$0")/../common.sh"
$MASTER "${TIMIT_ARGS[@]}" --output-dir example_out --output-id example_lstm \
    "--network-spec=-n lstm -l 4 -u 1024 --timedelay 5 -d 0.2"
