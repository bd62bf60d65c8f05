#!/bin/sh
# The slow gate tier (per-query budget gates at sf0.001 and sf0.01 —
# 842 timed runs, ~25-35 min). Deselected from the default pytest run
# so the fast correctness tier finishes inside the driver's budget
# (r11, VERDICT r10 item 2); run this before every round boundary or
# after touching any query's plan shape.
set -e
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -m slow -q "$@"
