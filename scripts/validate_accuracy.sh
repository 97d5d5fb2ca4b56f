#!/bin/sh
# Turnkey accuracy validation against the reference's published numbers
# (BASELINE.md). Requires the released artifacts (not downloadable in the
# dev environment — zero egress; run wherever they are available):
#
#   ARTIFACTS/
#     TubeR_CSN152_AVA22.pth        # s3://dl.fbaipublicfiles... see reference README.md:25
#     TubeR_CSN152_JHMDB.pth        #                      ... README.md:31
#     irCSN_152_ft_kinetics_from_ig65m_f126851907.mat     # backbone
#     detr.pth                      # COCO DETR seed (train-time only)
#   DATA/ava/...                    # frames + annotations (scripts/prepare_ava.sh)
#   DATA/jhmdb/...                  # frames + JHMDB-GT.pkl
#
# Pass criteria (BASELINE.md): AVA 2.2 frame mAP within 0.1 of 31.1;
# JHMDB video-mAP@0.5 within 0.1 of 82.3.
set -e

ARTIFACTS=${ARTIFACTS:-/data/artifacts}
DATA=${DATA:-/data}
OUT=${OUT:-/tmp/tuber_accuracy}
mkdir -p "$OUT"

cat > "$OUT/eval_ava22.yaml" <<EOF
CONFIG:
  DATA:
    DATASET_NAME: ava
    NUM_CLASSES: 80
    IMG_SIZE: 256
    TEMP_LEN: 32
    FRAME_RATE: 2
    LABEL_PATH: $DATA/ava/annotations/ava_action_list_v2.2_for_activitynet_2019.pbtxt
    ANNO_PATH: $DATA/ava/annotations/ava_{}_v22.json
    DATA_PATH: $DATA/ava/frames/
  MODEL:
    BACKBONE_NAME: CSN-152
    TEMPORAL_DS_STRATEGY: decode
    LAST_STRIDE: false
    QUERY_NUM: 15
    COMPUTE_DTYPE: bfloat16
    LOAD: true
    LOAD_FC: true
    PRETRAINED_PATH: $ARTIFACTS/TubeR_CSN152_AVA22.pth
  VAL:
    BATCH_SIZE: 4
  LOG:
    BASE_PATH: $OUT/ava22
EOF

cat > "$OUT/eval_jhmdb.yaml" <<EOF
CONFIG:
  DATA:
    DATASET_NAME: jhmdb
    NUM_CLASSES: 21
    IMG_SIZE: 224
    TEMP_LEN: 32
    ANNO_PATH: $DATA/jhmdb/JHMDB-GT.pkl
    DATA_PATH: $DATA/jhmdb/Frames/
  MODEL:
    BACKBONE_NAME: CSN-152
    TEMPORAL_DS_STRATEGY: decode
    LAST_STRIDE: false
    QUERY_NUM: 10
    COMPUTE_DTYPE: bfloat16
    LOAD: true
    LOAD_FC: true
    PRETRAINED_PATH: $ARTIFACTS/TubeR_CSN152_JHMDB.pth
  VAL:
    BATCH_SIZE: 4
  LOG:
    BASE_PATH: $OUT/jhmdb
EOF

echo "== AVA 2.2 frame mAP (target 31.1 +- 0.1) =="
python -m tubelet_transformer_tpu.cli.eval_ava --config-file "$OUT/eval_ava22.yaml"

echo "== JHMDB frame + video mAP (targets v-mAP@0.2 87.4, @0.5 82.3) =="
python -m tubelet_transformer_tpu.cli.eval_jhmdb --config-file "$OUT/eval_jhmdb.yaml"
