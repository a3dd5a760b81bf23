#!/bin/sh
# Fetch-once helper for the s3a smoke's classpath (VERDICT r10 #4).
#
# The pip pyspark wheel ships hadoop-client-{api,runtime} but NOT
# hadoop-aws, so S3AFileSystem is absent and tests/test_s3_smoke.py
# records a SKIP wherever these jars are missing. This script
# downloads the two jars from Maven Central into deploy/jars/, where
# run_s3_smoke.sh picks them up automatically via --jars. Run it ONCE
# anywhere with network (the dev container has none — run it at deploy
# image build time, or on the host and mount the dir):
#
#   deploy/fetch_s3_jars.sh            # versions matched to the wheel
#   HADOOP_VERSION=3.4.2 AWS_BUNDLE_VERSION=2.24.6 deploy/fetch_s3_jars.sh
#
# HADOOP_VERSION must match the wheel's hadoop-client-api jar
# (`ls $(python -c 'import pyspark,os;print(os.path.dirname(pyspark.__file__))')/jars | grep hadoop-client-api`).
# AWS_BUNDLE_VERSION must match the <aws-java-sdk-v2.version> property
# of that Hadoop release's hadoop-project POM — override if the
# default drifts from your Hadoop version.
set -eu

cd "$(dirname "$0")"

HADOOP_VERSION="${HADOOP_VERSION:-3.4.2}"
AWS_BUNDLE_VERSION="${AWS_BUNDLE_VERSION:-2.24.6}"
MAVEN="${MAVEN_MIRROR:-https://repo1.maven.org/maven2}"

mkdir -p jars
fetch() {
    # curl if present, else wget — deploy bases differ
    url="$1"; out="jars/$(basename "$1")"
    [ -s "$out" ] && { echo "have $out"; return; }
    echo "fetching $url"
    if command -v curl >/dev/null 2>&1; then
        curl -fSL -o "$out.tmp" "$url"
    else
        wget -q -O "$out.tmp" "$url"
    fi
    mv "$out.tmp" "$out"
}

fetch "$MAVEN/org/apache/hadoop/hadoop-aws/$HADOOP_VERSION/hadoop-aws-$HADOOP_VERSION.jar"
fetch "$MAVEN/software/amazon/awssdk/bundle/$AWS_BUNDLE_VERSION/bundle-$AWS_BUNDLE_VERSION.jar"
echo "done — run_s3_smoke.sh will add deploy/jars/*.jar via --jars"
