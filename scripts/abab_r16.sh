#!/bin/bash
# ABAB attribution runner for the r15 verdict's four CPU-doubled queries
# (j2_fuzzy_probe, d5_embedding_dup, t40_predlang_mix, p12_nonnull_keys):
# interleaves r15-code (worktree) and r16-code (repo) Bench invocations
# on the same host so same-code spread and cross-version delta separate.
set -e
Q="j2_fuzzy_probe,d5_embedding_dup,t40_predlang_mix,p12_nonnull_keys"
for round in 1 2; do
  for side in r15 r16; do
    dir=$([ "$side" = r15 ] && echo /tmp/wt_r15 || echo /root/repo)
    echo "=== $side pass $round ==="
    (cd "$dir" && SPARK_GRAFT_ONLY="$Q" SPARK_GRAFT_COLD=0 \
      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      sbt -batch "runMain graft.Bench" 2>/dev/null | tail -1)
    cp "$dir/bench_results.json" "/tmp/abab_${side}_p${round}.json"
  done
done
python3 - <<'PY'
import json
Q = ["j2_fuzzy_probe", "d5_embedding_dup", "t40_predlang_mix", "p12_nonnull_keys"]
for q in Q:
    row = [q]
    for side in ("r15", "r16"):
        for p in (1, 2):
            d = json.load(open(f"/tmp/abab_{side}_p{p}.json"))
            row.append(f"{d['queries'][q]:.2f}w/{d['queries_cpu'][q]:.1f}c")
    print(" | ".join(row))
PY
