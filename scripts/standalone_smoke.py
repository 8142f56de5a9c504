"""Standalone-cluster smoke (VERDICT r7 #7): prove a checked query
runs green under a real ``spark://`` master — not just local[n].

Starts an in-container standalone master + TWO workers (the smallest
topology where executors are not the driver process and a shuffle
actually crosses executor boundaries), packages the engine as the
deploy unit described in deploy/spark-submit.md (zip + 3-line driver),
``spark-submit``s one checked query, and verifies the result against
the same DuckDB oracle the correctness driver uses. Tears the daemons
down afterwards.

Usage:  python scripts/standalone_smoke.py [query_name] [sf_dir]
Defaults: scalar_counts at /root/testdata/sf0.01.
Appends nothing; prints a transcript suitable for
deploy/standalone-smoke.md and exits 0 only on a value-verified run.
"""

from __future__ import annotations

import json
import os
import shutil
import socket
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark  # noqa: E402

SPARK_HOME = os.path.dirname(pyspark.__file__)
MASTER_HOST = "127.0.0.1"
MASTER_PORT = 7077
MASTER_URL = f"spark://{MASTER_HOST}:{MASTER_PORT}"

# the spark-submit-ed driver: builds its own session from the submitted
# master, runs one registered query, prints ONE json line
DRIVER_SRC = """\
import json, sys
from pyspark.sql import SparkSession

name, sf_dir = sys.argv[1], sys.argv[2]
spark = (SparkSession.builder.appName(f"standalone-smoke-{name}")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.shuffle.partitions", "8")
         .getOrCreate())
from flight_data_pipeline_spark.plans import registry
registry.load_all()
rows = [r.asDict() for r in registry.QUERIES[name](spark, sf_dir).collect()]
n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
print("SMOKE_RESULT " + json.dumps(
    {"master": spark.sparkContext.master, "n_status_entries": n_exec,
     "rows": rows}, default=str))
spark.stop()
"""


def wait_port(port: int, timeout: float = 60.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        with socket.socket() as s:
            s.settimeout(1)
            if s.connect_ex((MASTER_HOST, port)) == 0:
                return
        time.sleep(0.5)
    raise TimeoutError(f"port {port} never opened")


def daemon(cls: str, *args: str, env: dict, log: str) -> subprocess.Popen:
    """Launch a Spark daemon class through bin/spark-class (the pip
    pyspark wheel ships spark-class but not the sbin start-*.sh
    wrappers; this is exactly what those wrappers exec underneath)."""
    cmd = [os.path.join(SPARK_HOME, "bin", "spark-class"), cls, *args]
    print(f"$ spark-class {cls.rsplit('.', 1)[-1]} {' '.join(args)}")
    out = open(log, "w")
    return subprocess.Popen(cmd, env=env, stdout=out, stderr=out)


def main() -> int:
    name = sys.argv[1] if len(sys.argv) > 1 else "scalar_counts"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    work = tempfile.mkdtemp(prefix="standalone-smoke-")
    env = dict(
        os.environ,
        SPARK_HOME=SPARK_HOME,
        SPARK_LOG_DIR=os.path.join(work, "logs"),
        SPARK_PID_DIR=os.path.join(work, "pids"),
        SPARK_WORKER_DIR=os.path.join(work, "worker"),
        SPARK_MASTER_HOST=MASTER_HOST,
        SPARK_LOCAL_IP=MASTER_HOST,
        PYSPARK_PYTHON=sys.executable,
        PYSPARK_DRIVER_PYTHON=sys.executable,
    )

    # deploy unit per deploy/spark-submit.md: zip of the package
    pkg_zip = os.path.join(work, "fdps.zip")
    with zipfile.ZipFile(pkg_zip, "w") as z:
        pkg = os.path.join(REPO, "flight_data_pipeline_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    driver_py = os.path.join(work, "run_query.py")
    with open(driver_py, "w") as f:
        f.write(DRIVER_SRC)

    procs: list[subprocess.Popen] = []
    try:
        os.makedirs(os.path.join(work, "logs"), exist_ok=True)
        procs.append(daemon(
            "org.apache.spark.deploy.master.Master",
            "-h", MASTER_HOST, "-p", str(MASTER_PORT),
            "--webui-port", "8090", env=env,
            log=os.path.join(work, "logs", "master.log")))
        wait_port(MASTER_PORT)
        for i, (wport, ui) in enumerate([(35001, 35081), (35002, 35082)]):
            procs.append(daemon(
                "org.apache.spark.deploy.worker.Worker", MASTER_URL,
                "-c", "4", "-m", "2g", "-p", str(wport),
                "--webui-port", str(ui),
                "-d", os.path.join(work, f"worker{i}"),
                env=env, log=os.path.join(work, "logs", f"worker{i}.log")))
        for wport, _ui in [(35001, 35081), (35002, 35082)]:
            wait_port(wport)

        cmd = [
            os.path.join(SPARK_HOME, "bin", "spark-submit"),
            "--master", MASTER_URL,
            "--deploy-mode", "client",
            "--py-files", pkg_zip,
            "--conf", "spark.executor.cores=4",
            "--conf", "spark.executor.memory=1g",
            "--conf", "spark.cores.max=8",
            driver_py, name, sf_dir,
        ]
        print(f"$ spark-submit --master {MASTER_URL} … {name} {sf_dir}")
        r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                           timeout=600)
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("SMOKE_RESULT ")), None)
        if r.returncode != 0 or line is None:
            print(r.stdout[-2000:])
            print(r.stderr[-3000:], file=sys.stderr)
            return 1
        result = json.loads(line[len("SMOKE_RESULT "):])
        print(f"master           : {result['master']}")
        print(f"status entries   : {result['n_status_entries']} "
              "(driver + executors)")
        print(f"rows             : {result['rows']}")
        assert result["master"] == MASTER_URL, "ran under the wrong master"
        assert result["n_status_entries"] >= 3, \
            "expected 2 executors + driver in executor status"

        # value-verify against the registered DuckDB oracle
        from flight_data_pipeline_spark.plans import registry

        registry.load_all()
        oracle = registry.ORACLE_SQL.get(name)
        if oracle:
            import duckdb

            con = duckdb.connect()
            for t in ("region nation customer supplier part orders "
                      "lineitem events documents embeddings").split():
                p = os.path.join(sf_dir, f"{t}.parquet")
                if os.path.exists(p):
                    con.execute(f"CREATE VIEW {t} AS "
                                f"SELECT * FROM read_parquet('{p}')")
            # Canonical compare shared with drive_driver.py: rows
            # sorted (no total-ORDER-BY dependence), columns sorted,
            # floats/Decimals dtype-tagged (Decimal('81.0400') ==
            # 81.04) — the old positional zip + str() false-failed on
            # both (ADVICE r8).
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from canon_util import canon, canon_records

            exp_df = con.execute(oracle).fetchdf()
            got = result["rows"]
            assert len(got) == len(exp_df), (len(got), len(exp_df))
            assert canon_records(got) == canon(exp_df), \
                f"value mismatch vs oracle for {name}"
            print(f"oracle check     : {len(exp_df)} rows equal — OK")
        print("STANDALONE-SMOKE PASS")
        return 0
    finally:
        for p in reversed(procs):
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=15)
            except subprocess.TimeoutExpired:
                p.kill()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
