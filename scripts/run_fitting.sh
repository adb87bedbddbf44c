#!/bin/bash
# Fitting launcher (frontend_sh_scripts fitting semantics):
# args = <gen_path> <fit_path> [proxe|habitat]
set -e
python -m psi_tpu.cli.fitting "${1:?gen_path}" "${2:?fit_path}" --dataset "${3:-proxe}" ${PROXE_PATH:+--proxe_path $PROXE_PATH} ${PROXE_PATH:---synthetic}
