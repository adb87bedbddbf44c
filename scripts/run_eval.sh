#!/bin/bash
# Eval launcher: args = <results_dir> [diversity|collision]
set -e
python -m psi_tpu.cli.eval --results_dir "${1:?results_dir}" --mode "${2:-diversity}" ${PROXE_PATH:+--proxe_path $PROXE_PATH} ${PROXE_PATH:---synthetic}
