#!/bin/bash
# Download a model and serve it in one step (reference:
# scripts/download_and_run.sh — same UX, but the model list comes from the
# live registry instead of a hand-maintained case table).
set -euo pipefail

PORT="${PORT:-8000}"
SAVE_DIR="${AHA_HOME:-$HOME/.aha}"

show_help() {
    echo "Usage: $0 <model-id> [extra aha-serv flags...]"
    echo ""
    echo "Downloads <model-id> into $SAVE_DIR (skipped if present) and"
    echo "starts 'aha serv' on port $PORT (override with PORT=...)."
    echo ""
    echo "Available models:"
    python -m aha_tpu list | awk 'NR>2 {print "  " $1}'
    exit 1
}

[ $# -ge 1 ] || show_help
MODEL_ID="$1"; shift

if ! python -m aha_tpu list | awk '{print $1}' | grep -qx "$MODEL_ID"; then
    echo "error: unknown model id '$MODEL_ID'" >&2
    show_help
fi

if [ ! -d "$SAVE_DIR/$MODEL_ID" ] || [ -z "$(ls -A "$SAVE_DIR/$MODEL_ID" \
        2>/dev/null)" ]; then
    echo "downloading $MODEL_ID -> $SAVE_DIR ..."
    python -m aha_tpu download "$MODEL_ID" --save-dir "$SAVE_DIR"
else
    echo "$MODEL_ID already downloaded"
fi

echo "serving $MODEL_ID on port $PORT ..."
exec python -m aha_tpu serv "$MODEL_ID" --port "$PORT" \
    --save-dir "$SAVE_DIR" "$@"
