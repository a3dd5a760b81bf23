"""spark-submit entrypoint for the deploy manifests.

``spark-submit`` takes a script file, not ``-m``; this shim forwards
its argv to the package CLI unchanged, so the manifests run exactly the
surface ``python -m poormans_kube_etl_spark`` runs locally:

    spark-submit --master k8s://... /opt/pke/deploy/submit_entry.py \
        watch --landing s3a://$BUCKET --output s3a://$OUTPUT_BUCKET

The reference ships the same split — an image whose CMD is the daemon
(`Dockerfile:19` ``npm start``) and K8s manifests that point at it
(README.md:66-125).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from poormans_kube_etl_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
