"""spark-submit --py-files packaging smoke (north rule: the job runs "via
spark-submit --py-files on a multi-executor cluster"): scripts/submit_job.sh
zips the library, ships it with --py-files and runs one resumable pass in a
FRESH JVM where log_aggregator_spark is importable only from the zip. The
routed output of that foreign-JVM run must equal an in-session run_job over
the same chunks table — token-array equality per row."""

from __future__ import annotations

import os
import subprocess

from pyspark.sql import functions as F

from log_aggregator_spark import chunker
from log_aggregator_spark.job import JobState, run_job
from log_aggregator_spark.tableio import SnapshotTable

from conftest import SF_DIR

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _routed_rows(spark, state_dir: str):
    routed = JobState(state_dir).routed.read(spark)
    return sorted(
        (r["doc_id"], r["session"], r["sink"], tuple(r["tokens"]))
        for r in routed.select("doc_id", "session", "sink", "tokens").collect()
    )


def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    docs = chunker.load_documents(spark, SF_DIR)
    chunks_root = str(tmp_path / "chunks")
    SnapshotTable(chunks_root).commit(chunker.chunks(docs))
    routes_path = str(tmp_path / "routes.parquet")
    chunker.routes_table(docs).write.parquet(routes_path)

    sub_state = str(tmp_path / "state_submit")
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    r = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "submit_job.sh"),
         "--master", "local[4]",
         "--chunks", chunks_root, "--routes", routes_path,
         "--state", sub_state],
        cwd=str(tmp_path),  # NOT the repo root: the zip must be the only source
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, (r.stdout + r.stderr)[-3000:]

    # twin run in this session, same inputs, fresh state
    ref_state = JobState(str(tmp_path / "state_ref"))
    run_job(spark, SnapshotTable(chunks_root),
            spark.read.parquet(routes_path), ref_state)

    got = _routed_rows(spark, sub_state)
    want = _routed_rows(spark, str(tmp_path / "state_ref"))
    assert len(got) > 0
    assert got == want  # per-row token-array equality across JVMs

    # the submitted pass checkpointed: its held/checkpoint tables exist too
    ck = JobState(sub_state).checkpoint.read(spark)
    assert ck.where(F.col("last_seq") >= 1).count() == ck.count()
