#!/bin/sh
# CI-level syntax gate for the shipped Airflow DAG: py_compile parses the
# file without importing Airflow, so it runs anywhere Python does.
set -e
cd "$(dirname "$0")/.."
python3 -m py_compile dags/*.py
echo "DAG syntax OK"
