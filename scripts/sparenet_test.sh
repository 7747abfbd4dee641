#!/bin/bash
# Evaluate sparenet (reference: scripts/sparenet_test.sh)
python test.py --model sparenet --weights "$1" --workdir ${WORKDIR:-./output} "${@:2}"
