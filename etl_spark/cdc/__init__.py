from etl_spark.cdc.chain import propagate_changes  # noqa: F401
from etl_spark.cdc.changelog import generate_changelog  # noqa: F401
from etl_spark.cdc.classify import classify_events  # noqa: F401
from etl_spark.cdc.lww import lww_winners  # noqa: F401
from etl_spark.cdc.replay import ReplayEngine  # noqa: F401
