#!/bin/bash
# Cheap box-phase probe (CLAUDE.md perf protocol): measures the box's
# 8-vs-32-worker scaling for (a) pure CPU (sha256 over /dev/zero) and
# (b) memory bandwidth (streaming reads of a /dev/shm file). Each worker
# does FIXED work, so ideal scaling = t8/t32 = 1.0. Fire a bench campaign
# only when cpu_eff >= 0.9 AND mem_eff >= 0.85 twice in a row.
set -e
PROBE=/dev/shm/box_probe_512m
[ -f "$PROBE" ] || head -c 512M /dev/zero > "$PROBE"

run_cpu() { # $1 = nworkers; fixed 150M sha256 per worker
  local n=$1 t0 t1
  t0=$(date +%s.%N)
  for i in $(seq "$n"); do head -c 150M /dev/zero | sha256sum > /dev/null & done
  wait
  t1=$(date +%s.%N)
  echo "$t0 $t1" | awk '{print $2-$1}'
}
run_mem() { # $1 = nworkers; each streams the 512M shm file twice
  local n=$1 t0 t1
  t0=$(date +%s.%N)
  for i in $(seq "$n"); do
    ( dd if="$PROBE" of=/dev/null bs=4M 2>/dev/null
      dd if="$PROBE" of=/dev/null bs=4M 2>/dev/null ) & done
  wait
  t1=$(date +%s.%N)
  echo "$t0 $t1" | awk '{print $2-$1}'
}

c8=$(run_cpu 8);  c32=$(run_cpu 32)
m8=$(run_mem 8);  m32=$(run_mem 32)
cpu_eff=$(echo "$c8 $c32" | awk '{printf "%.3f", $1/$2}')
mem_eff=$(echo "$m8 $m32" | awk '{printf "%.3f", $1/$2}')
echo "{\"cpu_t8\":$c8,\"cpu_t32\":$c32,\"cpu_eff\":$cpu_eff,\"mem_t8\":$m8,\"mem_t32\":$m32,\"mem_eff\":$mem_eff}"
