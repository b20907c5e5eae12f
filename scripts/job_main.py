"""Thin spark-submit driver file — the actual logic lives in the shipped
``log_aggregator_spark`` zip (see scripts/submit_job.sh)."""

from log_aggregator_spark.job import main

if __name__ == "__main__":
    main()
