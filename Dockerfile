# Container image for the engine + CLI, mirroring the reference's
# deployment surface (reference Dockerfile:1-19: builder stage runs the
# tests, slim runner ships the daemon) on the public Apache Spark
# image. The SAME image serves as driver and executor on Spark-on-K8s:
# the deploy manifests run /opt/pke/deploy/submit.sh as the driver
# container's command, and spark.kubernetes.container.image points back
# at this image so executor pods come up through the base image's
# UNTOUCHED /opt/entrypoint.sh (which is why no ENTRYPOINT override
# here — overriding it would break Spark-launched executor pods).
#
# Build:  docker build -t pke-spark:latest .
# Pin SPARK_IMAGE to the apache/spark python3 tag matching your
# cluster's Spark version (e.g. a 4.x -python3 tag for pyspark 4.1).
ARG SPARK_IMAGE=apache/spark:python3
FROM ${SPARK_IMAGE}

USER root

# The engine is pure Python on top of pyspark (already in the base
# image). Pillow enables the REAL image-decode path
# (operators/multimodal.py real_decode_image; without it the
# deterministic stub codec is used and decode(real=True) raises).
RUN pip install --no-cache-dir pillow

COPY poormans_kube_etl_spark /opt/pke/poormans_kube_etl_spark
COPY deploy /opt/pke/deploy
RUN chmod +x /opt/pke/deploy/submit.sh /opt/pke/deploy/fetch_s3_jars.sh
# fetch-once s3a classpath (deploy/fetch_s3_jars.sh): the apache/spark
# base image already ships hadoop-aws under $SPARK_HOME/jars on the
# -hadoop3 tags; for tags that don't, this pulls the matching pair at
# BUILD time (the only network-having moment) so run_s3_smoke.sh and
# s3a:// landing dirs work in the running container. Failure-tolerant:
# an air-gapped build still produces a working image minus s3a.
RUN /opt/pke/deploy/fetch_s3_jars.sh || echo "fetch_s3_jars: skipped (no network?)"
ENV PYTHONPATH=/opt/pke

# Non-root like the reference (Dockerfile:18 `USER 1000`); the apache
# image's spark user is uid 185.
USER 185
WORKDIR /opt/pke
