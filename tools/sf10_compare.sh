#!/bin/bash
# Incremental sf10 oracle compare: polls the Verify out dir and runs
# tools/check.py per key as each dump lands (_SUCCESS present), so the
# DuckDB side never starves behind the hours-long Spark dump.
# Usage: tools/sf10_compare.sh <out_dir> <sf_dir> <log>
OUT=$1; SF=$2; LOG=$3
DONE=/tmp/sf10_compared.list; touch $DONE
while true; do
  new=0
  for d in "$OUT"/*/; do
    k=$(basename "$d")
    [ -f "$d/_SUCCESS" ] || continue
    grep -qx "$k" $DONE && continue
    python3 /root/repo/tools/check.py "$OUT" "$SF" "$k" 2>&1 | grep -v "^$" | head -3 >> $LOG
    echo "$k" >> $DONE
    new=1
  done
  # stop when the dump wrote its oracle json (end of run) and all keys compared
  if [ -f "$OUT/oracle_sql.json.final" ]; then
    total=$(ls -d "$OUT"/*/ | wc -l); done_n=$(wc -l < $DONE)
    [ "$total" -le "$done_n" ] && break
  fi
  [ $new -eq 0 ] && sleep 60
done
echo "COMPARE COMPLETE $(date)" >> $LOG
