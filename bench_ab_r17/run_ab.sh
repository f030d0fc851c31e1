#!/bin/bash
# Interleaved A/B bench: BASELINE classes vs current repo classes, same host
# window, same JVM settings, same gate subset. THREE runs per side,
# interleaved base,cur,cur,base,cur,base so each side samples early, middle
# and late positions of the window (cancels slow host drift).
#
# Usage: run_ab.sh <baseline-classes-dir> [current-classes-dir] [testdata-sf-dir]
#   e.g. run_ab.sh /tmp/graft_r15/target/scala-2.13/classes
set -u
BASE="${1:?usage: run_ab.sh <baseline-classes-dir> [current-classes-dir] [testdata-sf-dir]}"
CUR="${2:-/root/repo/target/scala-2.13/classes}"
SFDIR="${3:-/root/testdata/sf0.1}"
# fail FAST on a missing side or fixture (r18 advice: a fresh checkout
# silently benched a nonexistent baseline classpath before)
for d in "$BASE" "$CUR" "$SFDIR"; do
  [ -d "$d" ] || { echo "missing directory: $d" >&2; exit 1; }
done
# r19 refresh (VERDICT r18 #7): include the current top-of-cost-table gates
# (KN-5 perplexity, jusText blocks, cross-corpus span dedup, keep-best
# ingest) so drift attribution covers where the time actually goes.
GATES="q_crawl_docx,q_crawl_pdf,q_crawl_text,q_warc_extract,q_pq_ivf_topk,q_unimax,q_jpeg_decode,q_tfidf,q_pagerank,q_html_extract,q_stratified,q_knn_mip,q_perplexity_kn5,q_boilerplate_blocks,q_cross_span_dedup,q_ingest_keep_best"
SPARKCP=$(echo /opt/spark/jars/*.jar | tr ' ' ':')
run_one() {  # $1 = classes dir, $2 = out json
  SPARK_GRAFT_SF_DIR="$SFDIR" \
  SPARK_GRAFT_BENCH_ONLY="$GATES" \
  SPARK_GRAFT_BENCH_PASSES=3 \
  SPARK_GRAFT_BENCH_OUT="$2" \
  java -Xmx96g -XX:+UseG1GC \
    --add-opens=java.base/java.lang=ALL-UNNAMED \
    --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
    --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
    --add-opens=java.base/java.io=ALL-UNNAMED \
    --add-opens=java.base/java.net=ALL-UNNAMED \
    --add-opens=java.base/java.nio=ALL-UNNAMED \
    --add-opens=java.base/java.util=ALL-UNNAMED \
    --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
    --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
    --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
    --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
    --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
    --add-opens=java.base/sun.security.action=ALL-UNNAMED \
    --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
    -cp "$1:$SPARKCP" graft.Bench > "$2.log" 2>&1 \
    || { echo "bench run failed (classes=$1, log=$2.log)" >&2; exit 1; }
  echo "ok $2"
}
mkdir -p /tmp/ab
# six runs, interleaved: base cur cur base cur base
run_one "$BASE" /tmp/ab/base_1.json
run_one "$CUR"  /tmp/ab/cur_1.json
run_one "$CUR"  /tmp/ab/cur_2.json
run_one "$BASE" /tmp/ab/base_2.json
run_one "$CUR"  /tmp/ab/cur_3.json
run_one "$BASE" /tmp/ab/base_3.json
echo DONE
