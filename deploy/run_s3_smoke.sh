#!/bin/sh
# Run the opt-in s3a smoke (tests/test_s3_smoke.py) against an
# S3-compatible endpoint. Three endpoint options, most- to
# least-infrastructure:
#
#   1. MinIO sidecar via docker: deploy/compose.s3-smoke.yml (see that
#      file for the up/down recipe). Default endpoint below matches it.
#   2. MinIO server binary directly (no docker):
#        MINIO_ROOT_USER=minioadmin MINIO_ROOT_PASSWORD=minioadmin \
#          minio server /tmp/minio-data &
#        mc mb local/pke-test-landing local/pke-test-output
#   3. moto server (no docker, no binary — pure Python, `pip install
#      moto[server]`): pass PKE_S3_SMOKE_MOTO=1 and this script starts
#      a ThreadedMotoServer, creates the buckets with boto3, exports
#      the endpoint env, and tears the server down afterwards. Any
#      credentials are accepted by moto; the defaults below work.
#
# All options need hadoop-aws on the Spark classpath — the deploy
# image ships it; against the pip pyspark wheel either
#   (a) run deploy/fetch_s3_jars.sh ONCE where network exists — the
#       jars land in deploy/jars/ and are added via --jars below, or
#   (b) pass HADOOP_AWS_PACKAGE=org.apache.hadoop:hadoop-aws:<hadoop
#       version>, forwarded via PYSPARK_SUBMIT_ARGS --packages (needs
#       network at run time).
# (The wheel alone cannot run this smoke: S3AFileSystem is not on its
# classpath and the dev container has no network to fetch it, which is
# why the dev container records a SKIP.)
set -eu

cd "$(dirname "$0")/.."

if [ -n "${HADOOP_AWS_PACKAGE:-}" ]; then
    PYSPARK_SUBMIT_ARGS="--packages ${HADOOP_AWS_PACKAGE} ${PYSPARK_SUBMIT_ARGS:-pyspark-shell}"
    export PYSPARK_SUBMIT_ARGS
elif ls deploy/jars/*.jar >/dev/null 2>&1; then
    # fetched-once jars (deploy/fetch_s3_jars.sh)
    JARS=$(ls deploy/jars/*.jar | tr '\n' ',' | sed 's/,$//')
    PYSPARK_SUBMIT_ARGS="--jars ${JARS} ${PYSPARK_SUBMIT_ARGS:-pyspark-shell}"
    export PYSPARK_SUBMIT_ARGS
fi

export PKE_S3_TEST_ENDPOINT="${PKE_S3_TEST_ENDPOINT:-http://localhost:9000}"
export PKE_S3_TEST_ACCESS_KEY="${PKE_S3_TEST_ACCESS_KEY:-minioadmin}"
export PKE_S3_TEST_SECRET_KEY="${PKE_S3_TEST_SECRET_KEY:-minioadmin}"
export PKE_S3_TEST_LANDING="${PKE_S3_TEST_LANDING:-pke-test-landing}"
export PKE_S3_TEST_OUTPUT="${PKE_S3_TEST_OUTPUT:-pke-test-output}"

if [ -n "${PKE_S3_SMOKE_MOTO:-}" ]; then
    # option 3: in-process S3 stand-in; endpoint overrides the default
    exec python - "$@" <<'PY'
import os
import subprocess
import sys

import boto3
from moto.server import ThreadedMotoServer

server = ThreadedMotoServer(port=0)  # OS-assigned free port
server.start()
try:
    host, port = server.get_host_and_port()
    endpoint = f"http://{host}:{port}"
    os.environ["PKE_S3_TEST_ENDPOINT"] = endpoint
    s3 = boto3.client(
        "s3",
        endpoint_url=endpoint,
        aws_access_key_id=os.environ["PKE_S3_TEST_ACCESS_KEY"],
        aws_secret_access_key=os.environ["PKE_S3_TEST_SECRET_KEY"],
        region_name="us-east-1",
    )
    s3.create_bucket(Bucket=os.environ["PKE_S3_TEST_LANDING"])
    s3.create_bucket(Bucket=os.environ["PKE_S3_TEST_OUTPUT"])
    rc = subprocess.call(
        [sys.executable, "-m", "pytest", "tests/test_s3_smoke.py", "-v", *sys.argv[1:]]
    )
finally:
    server.stop()
sys.exit(rc)
PY
fi

exec python -m pytest tests/test_s3_smoke.py -v "$@"
