#!/bin/bash
cd /root/repo
for args in \
  "slam_max_lifetime=12 slam_promote_obs=20" \
  "slam_max_lifetime=16 slam_promote_obs=20" \
  ; do
  echo "=== $args"
  timeout 900 python diag_nees.py $args 2>/dev/null | tail -1
done
