#!/bin/sh
# spark-submit launcher for the orchestrator on Spark-on-K8s.
#
# The env-var contract mirrors the reference's Deployment
# (/root/reference README.md:66-125: BUCKET / S3_ACCESS_KEY /
# S3_SECRET_KEY / REGION from a Secret), extended with the Spark-side
# knobs a K8s submit needs. Everything has a default except BUCKET and
# OUTPUT_BUCKET.
#
#   BUCKET              landing bucket/prefix holding pending/  (required)
#   OUTPUT_BUCKET       bucket/prefix for graph/index/metrics    (required)
#   S3_ACCESS_KEY       s3a credentials; omit both to use the
#   S3_SECRET_KEY         cluster's IAM / IRSA identity instead.
#                         Delivered via a mode-600 --properties-file,
#                         never argv (see below)
#   S3_PROPS_FILE       where to write that properties file
#                         (default: mktemp under /tmp)
#   S3_ENDPOINT         non-AWS S3 endpoint (optional)
#   K8S_MASTER          default k8s://https://kubernetes.default.svc
#   SPARK_IMAGE         executor image; default: this pod's own image,
#                         passed by the manifests via the downward API
#   K8S_NAMESPACE       default: default
#   SERVICE_ACCOUNT     default: spark
#   EXECUTOR_INSTANCES  default 2 (set 0 + K8S_MASTER=local[*] for
#                         single-pod smoke runs)
#   EXECUTOR_CORES      default 4
#   EXECUTOR_MEMORY     default 8g
#   DRIVER_MEMORY       default 4g
#   SHUFFLE_PARTITIONS  default 2000 — set HIGH and let AQE coalesce
#   POLL_INTERVAL       watch poll seconds, default 60
#   BUCKET_BUCKETS      graph-store bucketing fan-out, default 0 (off)
#   EXTRA_SPARK_ARGS    appended verbatim to spark-submit
#
# Usage: submit.sh [watch|run-once] [extra CLI args...]
# DRY_RUN=1 prints the assembled command instead of exec'ing it
# (pinned by tests/test_deploy.py).
set -eu

MODE="${1:-watch}"
[ "$#" -gt 0 ] && shift

: "${BUCKET:?set BUCKET (landing bucket with pending/)}"
: "${OUTPUT_BUCKET:?set OUTPUT_BUCKET (graph/index/metrics sinks)}"

K8S_MASTER="${K8S_MASTER:-k8s://https://kubernetes.default.svc}"
K8S_NAMESPACE="${K8S_NAMESPACE:-default}"
SERVICE_ACCOUNT="${SERVICE_ACCOUNT:-spark}"
SPARK_IMAGE="${SPARK_IMAGE:-apache/spark:python3}"
EXECUTOR_INSTANCES="${EXECUTOR_INSTANCES:-2}"
EXECUTOR_CORES="${EXECUTOR_CORES:-4}"
EXECUTOR_MEMORY="${EXECUTOR_MEMORY:-8g}"
DRIVER_MEMORY="${DRIVER_MEMORY:-4g}"
SHUFFLE_PARTITIONS="${SHUFFLE_PARTITIONS:-2000}"
POLL_INTERVAL="${POLL_INTERVAL:-60}"
BUCKET_BUCKETS="${BUCKET_BUCKETS:-0}"

# Credentials go through a mode-600 --properties-file, NEVER argv
# (ADVICE r7): --conf spark.hadoop.fs.s3a.secret.key=... is visible to
# every process on the node via /proc/<pid>/cmdline (Spark redacts it
# in the UI/event logs but cannot redact its own argv) and was echoed
# verbatim by DRY_RUN. spark.hadoop.* confs from the properties file
# reach executors through Spark's own conf propagation, same as --conf.
# S3_PROPS_FILE overrides the mktemp path (tests pin the contents).
#
# --properties-file REPLACES spark-submit's default loading of
# conf/spark-defaults.conf (ADVICE r08): silently dropping the image's
# baked-in defaults only when keys are set would make config differ
# between IAM and key-based deployments — so the credential file STARTS
# as a copy of spark-defaults.conf (when the image has one) and the
# credential lines are appended.
S3_CONF=""
if [ -n "${S3_ACCESS_KEY:-}" ]; then
    : "${S3_SECRET_KEY:?S3_ACCESS_KEY set without S3_SECRET_KEY}"
    PROPS_FILE="${S3_PROPS_FILE:-$(mktemp /tmp/pke-s3a.XXXXXX)}"
    touch "${PROPS_FILE}"
    chmod 600 "${PROPS_FILE}"
    DEFAULTS_FILE="${SPARK_HOME:-/opt/spark}/conf/spark-defaults.conf"
    if [ -f "${DEFAULTS_FILE}" ]; then
        # the extra newline guards a defaults file with no trailing
        # newline — without it the access-key line glues onto the last
        # default (blank lines are ignored by the properties parser)
        cat "${DEFAULTS_FILE}" > "${PROPS_FILE}"
        printf '\n' >> "${PROPS_FILE}"
    else
        : > "${PROPS_FILE}"
    fi
    printf 'spark.hadoop.fs.s3a.access.key %s\nspark.hadoop.fs.s3a.secret.key %s\n' \
        "${S3_ACCESS_KEY}" "${S3_SECRET_KEY}" >> "${PROPS_FILE}"
    S3_CONF="--properties-file ${PROPS_FILE}"
fi
if [ -n "${S3_ENDPOINT:-}" ]; then
    S3_CONF="${S3_CONF} --conf spark.hadoop.fs.s3a.endpoint=${S3_ENDPOINT}"
fi

# Client deploy-mode: the Deployment/CronJob pod IS the driver (logs,
# restartPolicy and liveness stay with the K8s object, matching the
# reference's daemon pod); executors are Spark-launched pods from the
# same image.
CMD="spark-submit \
--master ${K8S_MASTER} \
--deploy-mode client \
--name pke-${MODE} \
--conf spark.kubernetes.namespace=${K8S_NAMESPACE} \
--conf spark.kubernetes.authenticate.driver.serviceAccountName=${SERVICE_ACCOUNT} \
--conf spark.kubernetes.container.image=${SPARK_IMAGE} \
--conf spark.executor.instances=${EXECUTOR_INSTANCES} \
--conf spark.executor.cores=${EXECUTOR_CORES} \
--conf spark.executor.memory=${EXECUTOR_MEMORY} \
--conf spark.driver.memory=${DRIVER_MEMORY} \
--conf spark.sql.shuffle.partitions=${SHUFFLE_PARTITIONS} \
${S3_CONF} \
${EXTRA_SPARK_ARGS:-} \
/opt/pke/deploy/submit_entry.py \
${MODE} \
--landing s3a://${BUCKET} \
--output s3a://${OUTPUT_BUCKET} \
--poll-interval ${POLL_INTERVAL} \
--bucket-buckets ${BUCKET_BUCKETS}"

if [ -n "${DRY_RUN:-}" ]; then
    echo "$CMD" "$@"
    exit 0
fi
exec $CMD "$@"
