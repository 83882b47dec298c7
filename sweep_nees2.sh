#!/bin/bash
# refinement: promote_obs=20 synergy combos
cd /root/repo
for args in \
  "slam_max_lifetime=20 slam_promote_obs=20" \
  "slam_promote_obs=20" \
  "slam_max_lifetime=60 slam_promote_obs=20" \
  "slam_max_lifetime=40 slam_promote_obs=20 slam_init_noise_floor=0.02" \
  ; do
  echo "=== $args"
  timeout 900 python diag_nees.py $args 2>/dev/null | tail -1
done
