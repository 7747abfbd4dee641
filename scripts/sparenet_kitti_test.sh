#!/bin/bash
# Export KITTI benchmark completions (reference: scripts/*kitti*.sh)
python test.py --model sparenet --weights "$1" --test_mode kitti --workdir ${WORKDIR:-./output} "${@:2}"
