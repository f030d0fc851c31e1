#!/bin/bash
# Interleaved A/B bench: r15 closing code vs current (r17) code, same host
# window, same JVM settings, same gate subset. THREE runs per side,
# interleaved r15,r17,r17,r15,r17,r15 so each side samples early, middle
# and late positions of the window (cancels slow host drift).
set -u
GATES="q_crawl_docx,q_crawl_pdf,q_crawl_text,q_warc_extract,q_pq_ivf_topk,q_unimax,q_jpeg_decode,q_tfidf,q_pagerank,q_html_extract,q_stratified,q_knn_mip"
SPARKCP=$(echo /opt/spark/jars/*.jar | tr ' ' ':')
run_one() {  # $1 = classes dir, $2 = out json
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
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
    -cp "$1:$SPARKCP" graft.Bench > "$2.log" 2>&1
  echo "rc=$? $2"
}
R15=/tmp/graft_r15/target/scala-2.13/classes
R17=/root/repo/target/scala-2.13/classes
mkdir -p /tmp/ab
# six runs, interleaved: r15 r17 r17 r15 r17 r15
run_one $R15 /tmp/ab/r15_1.json
run_one $R17 /tmp/ab/r17_1.json
run_one $R17 /tmp/ab/r17_2.json
run_one $R15 /tmp/ab/r15_2.json
run_one $R17 /tmp/ab/r17_3.json
run_one $R15 /tmp/ab/r15_3.json
echo DONE
