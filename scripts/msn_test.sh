#!/bin/bash
# Evaluate msn (reference: scripts/msn_test.sh)
python test.py --model msn --weights "$1" --workdir ${WORKDIR:-./output} "${@:2}"
