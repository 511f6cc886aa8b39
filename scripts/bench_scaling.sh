#!/usr/bin/env bash
# Scaling-evidence profile (r18, verdict item 7): at sf0.1 the FULL suite is
# fixed-latency-bound (229/291 queries flat 8c->32c in the r17 driver data;
# catalog statements, commit cycles, tiny exchanges), so it cannot show
# parallel scaling no matter how well the operators scale. This profile
# benches only the DATA-DENSE kernels — per-row compute over full fixture
# tables with no per-statement floor — at two core counts, so section-2
# shuffle/partitioning work has an observable scaling signal.
#
# Usage: scripts/bench_scaling.sh [sfdir]        (default /root/testdata/sf0.1)
# Writes /tmp/graft_scaling_{8,32}.json and prints a per-query ratio table.
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.1}"
# data-dense set: text kernels (winnow/fuzzy/deflate/langid), multimodal
# decode+hash (image/audio/video), embedding kernels (rp-project, hash-embed,
# sq8), window/aggregation over the widest fixture tables
QS="t_fuzzy_match,t_winnow,t_compress_ratio,t_langid,t_hash_embed,s_rp_project,s_sq8_codes,m_image_dhash,m_audio_ahash,m_video_thash,m_resize,q_window_running,q_math_fns,d_simhash_exact,d_paragraph_dedup"
for CPUS in 8 32; do
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=$CPUS \
    SPARK_GRAFT_BENCH_ONLY="$QS" \
    SPARK_GRAFT_BENCH_LABEL="scaling-${CPUS}c" \
    SPARK_GRAFT_BENCH_OUT="/tmp/graft_scaling_${CPUS}.json" \
    scripts/run.sh graft.Bench > /dev/null 2>&1
done
python3 - <<'EOF'
import json
lo = json.load(open('/tmp/graft_scaling_8.json'))
hi = json.load(open('/tmp/graft_scaling_32.json'))
print(f"{'query':24s} {'8c':>8s} {'32c':>8s} {'8c/32c':>8s}")
ge2 = n = 0
for k in sorted(hi['queries']):
    r = lo['queries'][k] / hi['queries'][k]
    n += 1; ge2 += (r >= 2.0)
    print(f"{k:24s} {lo['queries'][k]:8.3f} {hi['queries'][k]:8.3f} {r:8.2f}x")
print(f"total {lo['value']:.2f} -> {hi['value']:.2f}  ({lo['value']/hi['value']:.2f}x); {ge2}/{n} queries >= 2x at 4x cores")
EOF
