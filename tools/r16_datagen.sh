#!/usr/bin/env bash
# Round-16 (resumed session): the host was reset between the r16 ANN
# campaign and the streaming campaign — /root/repo/data (sf1/sf10/sf100,
# synthesized in r11 by graft.ScaleGen) and the /tmp serving stores are
# gone. Regenerate the three scale corpora deterministically (same
# (src, k, seed=42) triple as r11, so every content-addressed layout and
# every prior measurement refers to the same rows).
set -uo pipefail
cd "$(dirname "$0")/.."
CLS=${CLS:-/tmp/graft_cls_r16}
SRC=/root/testdata/sf0.1

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done

MIN_FREE_KB=8000000
jrun() {
  local mem="$1"; shift
  java $ADD_OPENS "-Xmx$mem" -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$CLS:/opt/spark/jars/*" "$@" &
  local jpid=$!
  while kill -0 $jpid 2>/dev/null; do
    local free_kb; free_kb=$(df / | tail -1 | awk '{print $4}')
    if [ "$free_kb" -lt "$MIN_FREE_KB" ]; then
      echo "[r16gen] DISK WATCHDOG: ${free_kb}KB free - killing $1"
      kill -9 $jpid; sleep 2; rm -rf /tmp/blockmgr-* /tmp/spark-* 2>/dev/null; break
    fi
    sleep 10
  done
  wait $jpid
}
step() { echo "[r16gen] $* $(date -u +%H:%M:%S)"; }

for pair in "sf1 10 24g" "sf10 100 32g" "sf100 1000 64g"; do
  set -- $pair
  name=$1; k=$2; mem=$3
  out=/root/repo/data/$name
  if [ -f "$out/_gen_complete" ]; then step "$name already complete"; continue; fi
  rm -rf "$out"
  step "generating $name (x$k)"
  SPARK_GRAFT_CPUS=32 jrun "$mem" graft.ScaleGen "$SRC" "$out" "$k" \
    > /tmp/r16_gen_$name.out 2>&1
  rc=$?
  step "$name rc=$rc"
  if [ $rc -eq 0 ] && grep -q "\[scalegen\] wrote" /tmp/r16_gen_$name.out; then
    touch "$out/_gen_complete"
  else
    tail -5 /tmp/r16_gen_$name.out; exit 1
  fi
done
step "all corpora done"; du -sh /root/repo/data/* 2>/dev/null
