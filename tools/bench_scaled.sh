#!/bin/bash
# One-command scale-amortization bench: the heaviest-query subset timed
# Spark-vs-DuckDB-oracle at sf0.1 (factor 1) AND at x10 / x100 scaled
# copies (events/documents/embeddings replicated with offset keys —
# factor disjoint copies of the original workload, within-replica
# distributions untouched). Results merge into BENCH_scaled.json, which
# graft.Bench embeds into each round's BENCH_full.json.
#
# The point: at sf0.1 several queries are dominated by Spark's fixed
# per-job overhead (micro-batch machinery, multi-job iteration); the
# per-query ratio TREND across factors is the honest scale signal —
# data-proportional queries cross below 1x while DuckDB's single-thread
# cost keeps growing linearly.
set -euo pipefail
cd "$(dirname "$0")/.."
FACTORS=${FACTORS:-"1 10 100"}
REPS=${REPS:-2}
QUERIES=${QUERIES:-"s3_store_roundtrip gr2_expand gr3_pagerank gr4_components gr5_triangles gr6_ppr gr7_kcore tok2_bpe_merges sim9_ivf_trained bf2_bloom_join st5_interval_join st9_neardup_stream x3_xref_incremental a3_changed_canonical gr1_degree ovl1_source_overlap a1_merge_dedupe sk3_stream_countmin kw1_tfidf_terms cur6_curation_funnel cdf1_version_diff"}

# fresh oracle_sql.json (Verify with one cheap query still dumps all SQL)
DUMP=/tmp/graft-scaled-oracle-dump
sbt -batch "runMain graft.Verify /root/testdata/sf0.001 $DUMP a5_count_entities" >/dev/null 2>&1 || true

for F in $FACTORS; do
  if [ "$F" = 1 ]; then
    DIR=/root/testdata/sf0.1
  else
    DIR=/tmp/graft-sfx$F
    if [ ! -f "$DIR/events.parquet" ]; then
      sbt -batch "runMain graft.tools.ScaleData /root/testdata/sf0.1 $DIR $F"
    fi
  fi
  SPARK_GRAFT_SF_DIR=$DIR SPARK_GRAFT_REPS=$REPS \
    SPARK_GRAFT_BENCH_OUT=/tmp/graft-scaled-spark-f$F.json \
    sbt -batch "runMain graft.Bench $QUERIES" | grep '"metric"' || true
  python3 tools/time_oracle.py "$DIR" "$DUMP/oracle_sql.json" "$REPS" $QUERIES \
    | tee /tmp/graft-scaled-oracle-f$F.txt
done

python3 - $FACTORS <<'EOF'
import json, re, sys
factors = [int(f) for f in sys.argv[1:]]
scales = []
for f in factors:
    spark = json.load(open(f'/tmp/graft-scaled-spark-f{f}.json'))
    oracle = {}
    for line in open(f'/tmp/graft-scaled-oracle-f{f}.txt'):
        m = re.match(r'\s*([0-9.]+)\s+(\S+)\s*$', line)
        if m and not line.startswith('TOTAL'):
            oracle[m.group(2)] = float(m.group(1))
    sq = spark['queries']
    common = sorted(set(sq) & set(oracle))
    per = {q: {'spark': round(sq[q], 4), 'oracle': round(oracle[q], 4),
               'ratio': round(sq[q] / oracle[q], 3)} for q in common}
    st, ot = sum(sq[q] for q in common), sum(oracle[q] for q in common)
    scales.append({'factor': f, 'n_queries': len(common),
                   'spark_total': round(st, 3), 'oracle_total': round(ot, 3),
                   'ratio': round(st / ot, 3), 'queries': per})
out = {'src_sf': 0.1, 'reps': spark.get('reps'), 'scales': scales}
json.dump(out, open('BENCH_scaled.json', 'w'), indent=1)
open('BENCH_scaled.json', 'a').write('\n')
for s in scales:
    print(json.dumps({k: v for k, v in s.items() if k != 'queries'}))
EOF
