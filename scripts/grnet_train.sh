#!/bin/bash
# Train grnet (reference: scripts/grnet_train.sh)
python train.py --model grnet --workdir ${WORKDIR:-./output} "$@"
