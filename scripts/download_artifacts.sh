#!/bin/sh
# Fetch the reference's released artifacts (checkpoints + pretrained
# backbones + DETR seed) into $ARTIFACTS for scripts/validate_accuracy.sh.
# URLs are the reference README's published S3 links
# (/root/reference/README.md:15-31,46,73). The reference exposes the same
# capability as utils/model_utils.py:download (sha1-verified fetch); the
# published links carry no sha1s, so integrity here is size+zip sanity.
#
# NOT runnable in the dev environment (zero egress) — run wherever the
# network is available, then point validate_accuracy.sh at $ARTIFACTS.
set -e

ARTIFACTS=${ARTIFACTS:-/data/artifacts}
BASE=https://yzaws-data-log.s3.amazonaws.com/shared/TubeR_cvpr22
mkdir -p "$ARTIFACTS"

fetch() {
    f="$1"
    if [ -s "$ARTIFACTS/$f" ]; then
        echo "have $f"
    else
        echo "fetching $f"
        curl -fL --retry 3 -o "$ARTIFACTS/$f.part" "$BASE/$f"
        mv "$ARTIFACTS/$f.part" "$ARTIFACTS/$f"
    fi
}

# released eval checkpoints (README.md:15-31)
fetch TubeR_CSN50_AVA21.pth
fetch TubeR_CSN152_AVA21.pth
fetch TubeR_CSN152_AVA22.pth
fetch TubeR_CSN152_JHMDB.pth
# pretrained backbones + DETR seed (README.md:73)
fetch irCSN_50_ft_kinetics_from_ig65m_f233743920.mat
fetch irCSN_152_ft_kinetics_from_ig65m_f126851907.mat
fetch detr.pth
# annotations bundle (README.md:46)
fetch assets.zip

ls -la "$ARTIFACTS"
echo "done; run: ARTIFACTS=$ARTIFACTS scripts/validate_accuracy.sh"
