#!/bin/bash
# Evaluate grnet (reference: scripts/grnet_test.sh)
python test.py --model grnet --weights "$1" --workdir ${WORKDIR:-./output} "${@:2}"
