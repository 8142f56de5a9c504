# Container packaging twin of the reference's documented Dockerfile
# (README.md:582 lists one; the file is absent from the snapshot, so
# this is the engine's own recipe, not a copy). One image serves all
# three entry points:
#
#   docker build -t flight-data-pipeline-spark .
#   # one ETL run (the reference's `python etl_job.py` / cron unit):
#   docker run --rm -v /data:/data flight-data-pipeline-spark \
#       --telemetry /data/telemetry --audit /data/audit
#   # ad-hoc analytics client:
#   docker run --rm -v /data:/data flight-data-pipeline-spark \
#       query daily_rollup --sf-dir /data/sf0.1
#   # bench harness:
#   docker run --rm --entrypoint python flight-data-pipeline-spark bench.py
#
# NOT built in the development container (no Docker daemon there —
# documented in COVERAGE.md); the image contents mirror the baked dev
# environment exactly (pyspark 4.1.2 / Java 17 / python 3.11), so a
# green test suite is the image's functional evidence.
#
# Cluster deploys don't use this image for executors: submit the same
# package to an existing cluster with deploy/spark-submit.md (the
# engine is pure PySpark — a zip of the package + spark-submit is the
# whole artifact).

FROM python:3.11-slim

# Spark 4 needs a JRE; headless 17 is the supported LTS line.
RUN apt-get update \
    && apt-get install -y --no-install-recommends openjdk-17-jre-headless \
    && rm -rf /var/lib/apt/lists/*
ENV JAVA_HOME=/usr/lib/jvm/java-17-openjdk-amd64

# Pin to the engine's tested matrix. pyspark ships its own Spark
# distribution, so no separate SPARK_HOME install step exists.
RUN pip install --no-cache-dir \
    pyspark==4.1.2 pyarrow pandas numpy

WORKDIR /app
COPY flight_data_pipeline_spark/ flight_data_pipeline_spark/
COPY bench.py __spark_entry__.py ./

# local[*] by default; override SPARK_GRAFT_* env to size the session
# (see session.get_spark: SPARK_GRAFT_CPUS, SPARK_GRAFT_DRIVER_MEM,
# SPARK_GRAFT_SF_DIR).
ENTRYPOINT ["python", "-m", "flight_data_pipeline_spark"]
