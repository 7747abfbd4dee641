#!/bin/bash
# Train SpareNet with adversarial rendering (reference: scripts/sparenet_gan_train.sh)
python train.py --model sparenet --gan --workdir ${WORKDIR:-./output} "$@"
