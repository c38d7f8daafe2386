#!/usr/bin/env bash
# Full user-journey smoke: fresh synthetic dataset -> every CLI end-to-end.
# Usage: bash tools/smoke.sh [workdir]   (defaults to a fresh temp dir)
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-$(mktemp -d /tmp/pva_smoke.XXXX)}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$REPO/.jax_cache}"
cd "$WORK"
echo "== workdir: $WORK"

echo "== 1. dataset (gz-backed, Breakfast-shaped)"
python "$REPO/tools/scale_smoke.py" --root ds --n_train 12 --n_dev 6 \
    --n_test 4 --t_min 150 --t_max 400 --write_gz

echo "== 2. stratified 5-fold splitting"
(cd ds && python "$REPO/data_splitting.py" --annot_path . --n_splits 2 | tail -1)

echo "== 3. LM corpus + ARPA training"
(cd ds && python "$REPO/lm_generation.py" --annot_path . --out corpus.txt \
    --arpa_out lm.arpa --order 3 | tail -1)

echo "== 4. train (bf16, device cache, metrics)"
(cd ds && python "$REPO/train.py" --model bigru --epoch 2 --batchsize 4 \
    --bucket_multiple 128 --annot_path . --data_dir ./data \
    --dtype bfloat16 --cache_device --metrics_jsonl metrics.jsonl \
    | grep -E "Train loss|segment")
CKPT=$(ls ds/models | sort | tail -1 | sed 's/.npz//')
echo "   checkpoint: $CKPT"

echo "== 5. eval (--eval) and beam eval (--eval --lm_path)"
(cd ds && python "$REPO/train.py" --model bigru --eval \
    --pretrained_model "$CKPT" --annot_path . --data_dir ./data \
    --bucket_multiple 128 | tail -2)

echo "== 6. ensemble inference (dev + test CSV)"
(cd ds && python "$REPO/inference.py" --pretrained_model "$CKPT" --prob big \
    --part dev --split 0 --annot_path . --data_dir ./data | tail -1)
(cd ds && python "$REPO/inference.py" --pretrained_model "$CKPT" --prob big \
    --part test --annot_path . --data_dir ./data | tail -1)

echo "== 7. scene aggregation"
(cd ds && python "$REPO/inference-scene.py" --pretrained_model "$CKPT" \
    --prob big --annot_path . --data_dir ./data | tail -1)

echo "== 8. LM beam search (host + device)"
(cd ds && python "$REPO/inference-lm.py" --pretrained_model "$CKPT" \
    --part dev --split 0 --lm_path lm.arpa --annot_path . --data_dir ./data \
    | tail -1)
(cd ds && python "$REPO/inference-lm.py" --pretrained_model "$CKPT" \
    --part dev --split 0 --lm_path lm.arpa --annot_path . --data_dir ./data \
    --device_beam | tail -1)

echo "== smoke OK ($WORK)"
