#!/bin/bash
# Train sparenet (reference: scripts/sparenet_train.sh)
python train.py --model sparenet --workdir ${WORKDIR:-./output} "$@"
