#!/bin/bash
# Round-4 post-fix confirmation sweep: re-baseline after the RANSAC/static-init
# fixes, confirm lifetime=20+promote_obs=20, probe neighbors.
cd /root/repo
for args in \
  "" \
  "slam_max_lifetime=20 slam_promote_obs=20" \
  "slam_max_lifetime=20" \
  "slam_promote_obs=20" \
  "slam_max_lifetime=16 slam_promote_obs=20" \
  "slam_max_lifetime=24 slam_promote_obs=20" \
  ; do
  echo "=== $args"
  timeout 900 python diag_nees.py $args 2>/dev/null | tail -1
done
