#!/usr/bin/env bash
# AVA dataset preparation: download -> 15-min chunk -> 30fps JPEG frames.
#
# One script with subcommands replacing the reference's three
# (datasets/download_ava.bash, chunk_video.sh, extract_frame.sh), written
# for parallel execution (xargs -P) since frame extraction is the long
# pole on a many-core TPU host.
#
# Usage:
#   scripts/prepare_ava.sh download  <videos_dir> [v2.1|v2.2]
#   scripts/prepare_ava.sh chunk     <videos_dir> <videos_15min_dir>
#   scripts/prepare_ava.sh frames    <videos_15min_dir> <frames_dir> [fps]
#   scripts/prepare_ava.sh annotations <anno_dir> [v2.1|v2.2]
#
# Frame layout produced: <frames_dir>/<video_id>/<video_id>_%06d.jpg —
# what data/ava.py expects (reference datasets/ava_frame.py:82-91 layout).
set -euo pipefail

AVA_S3="https://s3.amazonaws.com/ava-dataset"
JOBS="${JOBS:-$(nproc)}"

cmd="${1:?usage: prepare_ava.sh download|chunk|frames|annotations ...}"
shift

case "$cmd" in
  download)
    dir="${1:?videos dir}"; ver="${2:-v2.2}"
    mkdir -p "$dir"
    list="ava_file_names_trainval_${ver#v}.txt"
    [ -f "$dir/$list" ] || wget -q "$AVA_S3/annotations/$list" -P "$dir"
    xargs -a "$dir/$list" -P "$JOBS" -I{} \
      sh -c '[ -f "'"$dir"'/{}" ] || wget -q "'"$AVA_S3"'/trainval/{}" -P "'"$dir"'"'
    ;;
  chunk)
    src="${1:?src dir}"; dst="${2:?dst dir}"
    mkdir -p "$dst"
    ls -A1 "$src" | xargs -P "$JOBS" -I{} sh -c \
      '[ -f "'"$dst"'/{}" ] || ffmpeg -nostdin -loglevel error -ss 900 -t 901 \
         -i "'"$src"'/{}" -c copy "'"$dst"'/{}"'
    ;;
  frames)
    src="${1:?src dir}"; dst="${2:?dst dir}"; fps="${3:-30}"
    mkdir -p "$dst"
    for video in "$src"/*; do
      name="$(basename "$video")"; name="${name%.*}"
      printf '%s\t%s\n' "$video" "$name"
    done | xargs -P "$JOBS" -n2 sh -c \
      'mkdir -p "'"$dst"'/$1" && \
       [ -e "'"$dst"'/$1/$1_000001.jpg" ] || \
       ffmpeg -nostdin -loglevel error -i "$0" -r "'"$fps"'" \
         -q:v 1 "'"$dst"'/$1/$1_%06d.jpg"'
    ;;
  annotations)
    dir="${1:?anno dir}"; ver="${2:-v2.2}"
    mkdir -p "$dir"
    wget -q "$AVA_S3/annotations/ava_${ver}.zip" -P "$dir" || \
      wget -q "$AVA_S3/annotations/ava_${ver#v}.zip" -P "$dir"
    (cd "$dir" && unzip -o -q ava_*.zip)
    ;;
  *)
    echo "unknown subcommand: $cmd" >&2; exit 2
    ;;
esac
