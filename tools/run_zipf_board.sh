#!/bin/bash
# Extended zipf heterogeneity board (VERDICT r16 item #1): every
# text-path key, measured on the sf3zipf corpus (power-law doc
# lengths + one ~10MB planted giant per copy) under the forced-
# materialization noop action, at the unconstrained 24g child heap
# AND the 4g/32thr = 128MB-per-task stress cell. Cells for a key run
# back-to-back so machine drift stays inside the ratio (the r16
# discipline). Output: two JSONL files for assemble_zipf_board.py.
#
# Usage: tools/run_zipf_board.sh <sfZipfDir> <outDir> [keys...]
set -e
SF=${1:?sf zipf dir}
OUT=${2:?out dir}
shift 2
KEYS=("$@")
if [ ${#KEYS[@]} -eq 0 ]; then
  KEYS=(d01_dedup_exact d02_shingle_jaccard d03_minhash_lsh d04_simhash \
    d05_lang_score d06_quality d07_token_count d08_fingerprint \
    d10_bpe_tokens d11_winnow d13_curation d15_chunks d16_pack d17_scrub \
    d18_repetition d19_contamination d20_rarity d21_para_dedup \
    d22_dup_clusters d25_span_dedup d26_dedup_serve d27_near_dedup_serve \
    d28_vocab_topk d30_rarity_scored d31_span_scrub d32_source_mix \
    d33_tfidf_topk d34_inverted_index d35_pii_scrub d36_bool_retrieval \
    d37_bm25_topk d38_mix_sample d39_source_classifier d40_perplexity \
    d41_source_overlap d42_shuffle_shards d43_source_dup_rate \
    d44_bpe_pairs d45_canonical_dedup d46_token_yield d47_label_audit \
    d48_token_entropy d49_dedup_sweep d50_gopher_rules d51_split_leakage \
    d52_zipf_fit)
fi
mkdir -p "$OUT"
export SPARK_GRAFT_SF_DIR="$SF"
export SPARK_GRAFT_BENCH_ACTION=noop
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
for k in "${KEYS[@]}"; do
  echo "== $k uncon ==" >&2
  env -u SPARK_GRAFT_CHILD_XMX \
    java $OPENS -Xmx24g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench "$k" >> "$OUT/zipf_uncon.jsonl" || true
  echo "== $k stress ==" >&2
  SPARK_GRAFT_CHILD_XMX=4g \
    java $OPENS -Xmx24g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench "$k" >> "$OUT/zipf_stress.jsonl" || true
done
echo "done: $OUT/zipf_uncon.jsonl $OUT/zipf_stress.jsonl" >&2
