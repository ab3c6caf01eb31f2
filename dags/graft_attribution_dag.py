"""Airflow DAG driving the graft attribution pipeline on Spark.

Mirrors the reference pipeline's orchestration contract (reference
dags/attribution_pipeline_dag.py:17-81: one FileSensor gating three
sequential pipeline steps) re-expressed for a Spark engine: each step is
a `spark-submit` of `graft.Main` (see ORCHESTRATION.md for the step
contract and the artifacts each step consumes/produces).

Differences from the reference wiring, by design:

- No API secret on the default path: the IHC scorer is in-engine
  (graft.ops.IhcScorer), so the `score` step needs no credentials. To
  score through an external HTTP service instead, switch the step to
  `score-external` and attach the secret as an env var on that one task
  (commented below) - the retry/backoff and partial-failure channel live
  inside the engine operator, so the DAG needs no retry wiring of its own.
- `spark.sql.shuffle.partitions` and executor sizing belong in the
  submit conf, not the DAG; the values below are placeholders sized for
  a small cluster and meant to be overridden per deployment.

Validated with `python -m py_compile` in CI (tools/lint_dag.sh); running
it needs an Airflow deployment with the Apache Spark provider installed.
"""

from datetime import datetime

from airflow import DAG
from airflow.providers.apache.spark.operators.spark_submit import (
    SparkSubmitOperator,
)
from airflow.sensors.filesystem import FileSensor

DATA_DIR = "/data/tables"
OUT_DIR = "/data/out"
GRAFT_JAR = "/opt/graft/graft.jar"

with DAG(
    "graft_attribution_pipeline",
    description="graft IHC attribution pipeline (Spark)",
    schedule=None,  # triggered by data availability, same as the reference
    start_date=datetime(2026, 1, 1),
    catchup=False,
    tags=["attribution", "marketing", "spark"],
) as dag:

    # Same readiness contract as the reference sensor: poll a flag file
    # every 5 minutes, give up after 2 hours, free the worker slot
    # between pokes. (The engine's StreamingIngest.runAvailableNow is the
    # sensor-free alternative - see ORCHESTRATION.md "incremental mode".)
    data_ready = FileSensor(
        task_id="wait_for_data",
        filepath="/data/ready/data_ready.flag",
        poke_interval=300,
        timeout=2 * 60 * 60,
        mode="reschedule",
    )

    def spark_step(step: str) -> SparkSubmitOperator:
        """One pipeline step as its own Spark application - per-step
        retry granularity, matching the reference's pod-per-step shape.
        (Use --step all in a single task instead when one cluster
        allocation for the whole pipeline is preferable.)"""
        return SparkSubmitOperator(
            task_id=step.replace("-", "_"),
            application=GRAFT_JAR,
            java_class="graft.Main",
            application_args=[
                "--data-dir", DATA_DIR,
                "--out-dir", OUT_DIR,
                "--step", step,
            ],
            conf={
                "spark.sql.adaptive.enabled": "true",
                "spark.sql.shuffle.partitions": "200",
            },
            # For the external-scorer variant on the `score-external`
            # step, inject the credential the way the reference does
            # (env secret on the scoring task only):
            # env_vars={"API_KEY": "{{ var.value.graft_api_key }}"},
        )

    build_journeys = spark_step("build-journeys")
    score = spark_step("score")
    report = spark_step("report")

    data_ready >> build_journeys >> score >> report
