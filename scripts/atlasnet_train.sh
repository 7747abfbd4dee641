#!/bin/bash
# Train atlasnet (reference: scripts/atlasnet_train.sh)
python train.py --model atlasnet --workdir ${WORKDIR:-./output} "$@"
