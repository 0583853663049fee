#!/bin/bash
# Run when the TPU tunnel returns (it went down mid-round-3).  Captures
# every pending silicon measurement into /tmp/tpu_return/.
#
#   bash tools/tpu_return_checklist.sh
#
# Then, if the Pallas roll A/B wins: flip the default in
# ops/augment._use_pallas_roll, update PERFORMANCE.md + CLAUDE.md, rerun
# bench.py, commit.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_return
mkdir -p "$OUT"

echo "== 1. native Pallas kernel tests (incl. shear-roll + preprocess retry)"
IMGSEG_TEST_REAL_TPU=1 timeout 1800 python -m pytest \
    tests/test_real_tpu_kernels.py -v 2>&1 | tee "$OUT/real_tpu_tests.log" | tail -8

echo "== 2. headline A/B: Pallas shear-roll OFF (committed default)"
timeout 900 python bench.py 2> "$OUT/bench_roll_off.log" | tee "$OUT/bench_roll_off.json" | tail -1
echo "== 3. headline A/B: Pallas shear-roll ON"
IMGSEG_PALLAS_ROLL=1 timeout 900 python bench.py 2> "$OUT/bench_roll_on.log" \
    | tee "$OUT/bench_roll_on.json" | tail -1

echo "== 4. new secondary benchmarks (prompt / autoencoder / serving)"
timeout 3600 python bench_extra.py prompt autoencoder infer 2> "$OUT/bench_extra_new.log" \
    | grep '^{' | tee "$OUT/bench_extra_new.json"

echo "== 5. ClipUnet@256 refresh (post-ungating table row)"
timeout 900 python bench_extra.py clip 2> "$OUT/bench_clip.log" \
    | grep '^{' | tee "$OUT/bench_clip.json"
echo "== 6. ClipUnet(+Prompt)@256 A/B: fold-2 level 1 + prompt w2d ON"
IMGSEG_BENCH_CLIP_W2D_L1F2=1 IMGSEG_BENCH_PROMPT_W2D=1 \
    timeout 1800 python bench_extra.py clip prompt 2> "$OUT/bench_clip_l1f2.log" \
    | grep '^{' | tee "$OUT/bench_clip_l1f2.json"
echo "== 7. autoencoder A/B: w2d ON"
IMGSEG_BENCH_AE_W2D=1 timeout 900 python bench_extra.py autoencoder 2> "$OUT/bench_ae_w2d.log" \
    | grep '^{' | tee "$OUT/bench_ae_w2d.json"

echo "done -> $OUT"
