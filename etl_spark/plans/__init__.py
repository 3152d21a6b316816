"""Config-driven logical plans (SURVEY.md §1.1 / §3.3)."""

from etl_spark.plans.config_plan import build_merge_plan  # noqa: F401
