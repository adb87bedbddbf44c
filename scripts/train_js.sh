#!/bin/bash
# Training launcher with the reference's hyperparameter presets
# (frontend_sh_scripts/train_js.sh semantics): args = <model_type s1|s2>
# <use_prox_data 0|1> <use_scene_loss 0|1>
set -e
MODEL_TYPE=${1:-s1}
USE_PROX=${2:-0}
USE_SCENE_LOSS=${3:-1}

BATCH=32; EPOCH=30; LR=0.0003; LOSS_VPOSER=0.001; LOSS_KL=0.1
if [ "$USE_SCENE_LOSS" = "1" ]; then
  LOSS_CONTACT=0.01; LOSS_COLLISION=0.1
else
  LOSS_CONTACT=0.000001; LOSS_COLLISION=0.000001
fi

SAVE_DIR="checkpoints/checkpoints_proxtrain_model$(echo $MODEL_TYPE | tr a-z A-Z)_batch${BATCH}_epoch${EPOCH}_LR${LR}_LossVposer${LOSS_VPOSER}_LossKL${LOSS_KL}_LossContact${LOSS_CONTACT}_LossCollision${LOSS_COLLISION}"
mkdir -p trainlogs

DATA_ARGS="--synthetic"
if [ "$USE_PROX" = "1" ]; then DATA_ARGS="--proxe_path ${PROXE_PATH:?set PROXE_PATH}"; fi

python -m psi_tpu.cli.train --model_type "$MODEL_TYPE" --save_dir "$SAVE_DIR" \
  --batch_size $BATCH --num_epoch $EPOCH --lr_h $LR \
  --weight_loss_vposer $LOSS_VPOSER --weight_loss_kl $LOSS_KL \
  --weight_loss_contact $LOSS_CONTACT --weight_loss_collision $LOSS_COLLISION \
  $DATA_ARGS 2>&1 | tee "trainlogs/traininfo_${MODEL_TYPE}.txt"
