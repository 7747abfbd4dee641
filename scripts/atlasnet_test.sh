#!/bin/bash
# Evaluate atlasnet (reference: scripts/atlasnet_test.sh)
python test.py --model atlasnet --weights "$1" --workdir ${WORKDIR:-./output} "${@:2}"
