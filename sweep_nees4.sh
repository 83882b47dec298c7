#!/bin/bash
# Round-4 NEES sweep: slam_process_noise (landmark idp random walk) vs the
# lifetime-cap lever, on the re-baselined exact-noise 20-seed harness.
cd /root/repo
for args in \
  "" \
  "slam_process_noise=0.005" \
  "slam_process_noise=0.01" \
  "slam_process_noise=0.02" \
  "slam_process_noise=0.01 slam_max_lifetime=40" \
  "slam_max_lifetime=40" \
  ; do
  echo "=== $args"
  timeout 900 python diag_nees.py $args 2>/dev/null | tail -1
done
