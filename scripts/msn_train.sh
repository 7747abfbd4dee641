#!/bin/bash
# Train msn (reference: scripts/msn_train.sh)
python train.py --model msn --workdir ${WORKDIR:-./output} "$@"
