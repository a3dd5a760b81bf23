#!/bin/sh
# Run the opt-in s3a smoke (tests/test_s3_smoke.py) against the MinIO
# sidecar from deploy/compose.s3-smoke.yml. See that file for the full
# up/down recipe. Needs hadoop-aws on the Spark classpath — the deploy
# image ships it; against the pip pyspark wheel pass
# HADOOP_AWS_PACKAGE=org.apache.hadoop:hadoop-aws:<hadoop version> and
# this script forwards it via PYSPARK_SUBMIT_ARGS --packages.
set -eu

cd "$(dirname "$0")/.."

if [ -n "${HADOOP_AWS_PACKAGE:-}" ]; then
    PYSPARK_SUBMIT_ARGS="--packages ${HADOOP_AWS_PACKAGE} ${PYSPARK_SUBMIT_ARGS:-pyspark-shell}"
    export PYSPARK_SUBMIT_ARGS
fi

PKE_S3_TEST_ENDPOINT="${PKE_S3_TEST_ENDPOINT:-http://localhost:9000}" \
PKE_S3_TEST_ACCESS_KEY="${PKE_S3_TEST_ACCESS_KEY:-minioadmin}" \
PKE_S3_TEST_SECRET_KEY="${PKE_S3_TEST_SECRET_KEY:-minioadmin}" \
PKE_S3_TEST_LANDING="${PKE_S3_TEST_LANDING:-pke-test-landing}" \
PKE_S3_TEST_OUTPUT="${PKE_S3_TEST_OUTPUT:-pke-test-output}" \
exec python -m pytest tests/test_s3_smoke.py -v "$@"
