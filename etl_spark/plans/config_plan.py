"""Config-driven merge plans — the reference's declarative mini-IR.

``src/sensum/sensum.py:119-129`` turns a JSON config
``{merge_on, group_by, agg_columns, columns, name}`` into a pandas
join+groupby+rename pipeline at runtime. Re-expressed as a builder that
emits a DataFrame plan: the config is data, the plan is declarative, and
Catalyst still sees every stage (so pruning/pushdown/AQE all apply —
nothing about config-driven-ness costs optimization).

Config shape (one dict):
    {
      "base":   "customer",                       # driving table
      "joins": [{"table": "orders",
                 "on": [["c_custkey", "o_custkey"]],
                 "how": "left",
                 "select": ["o_orderkey", "o_totalprice", "o_custkey"]}],
      "filters": ["o_totalprice > 0"],            # SQL strings (P7)
      "group_by": ["c_custkey", "c_mktsegment"],
      "aggs": [{"fn": "count", "col": "o_orderkey", "as": "n_orders"},
               {"fn": "sum",  "col": "o_totalprice", "as": "total",
                "cast": "decimal(18,2)"}],
      "renames": {"c_mktsegment": "segment"}      # F17 bulk rename
    }

Name collisions (self-joins / re-joined tables): a right-side join key
whose name already exists in the running frame is dropped after the
join (USING semantics — reference the left copy downstream); a collided
non-key right column is renamed with an ``_r`` suffix before the join
(the pandas-merge suffix behavior, made deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_AGG_FNS = {
    "count": F.count,
    "sum": F.sum,
    "max": F.max,
    "min": F.min,
    "avg": F.avg,
    "first": F.first,
    "count_distinct": F.countDistinct,
}


def build_merge_plan(spark: SparkSession, sf_dir: str, config: dict) -> DataFrame:
    """Materialize the config as a DataFrame plan (lazy — caller executes)."""
    df = spark.read.parquet(f"{sf_dir}/{config['base']}.parquet")
    for j in config.get("joins", []):
        right = spark.read.parquet(f"{sf_dir}/{j['table']}.parquet")
        if sel := j.get("select"):
            right = right.select(*sel)
        # name-collision policy (self-joins, re-joined tables, shared
        # key names — duplicate names break every downstream by-name
        # reference with AMBIGUOUS_REFERENCE): right-side JOIN KEYS that
        # collide are dropped after the join (USING semantics — the left
        # copy is equal on matches, and the right is null on outer
        # misses), and collided NON-key right columns are suffixed
        # ``_r`` before it (the pandas-merge suffix behavior of the
        # reference's mini-IR, deterministic instead of _x/_y).
        before = set(df.columns)
        keys = {rk for _, rk in j["on"]}
        for c in right.columns:
            if c in before and c not in keys:
                new = c + "_r"
                while new in before or new in right.columns:
                    new += "_r"
                right = right.withColumnRenamed(c, new)
        cond = None
        for left_key, right_key in j["on"]:
            piece = df[left_key] == right[right_key]
            cond = piece if cond is None else (cond & piece)
        df = df.join(right, cond, j.get("how", "inner"))
        for _, right_key in j["on"]:
            if right_key in before:
                df = df.drop(right[right_key])
    for predicate in config.get("filters", []):
        df = df.filter(predicate)
    if group_by := config.get("group_by"):
        aggs = []
        for a in config.get("aggs", []):
            col = F.col(a["col"])
            if cast := a.get("cast"):
                col = col.cast(cast)
            agg = _AGG_FNS[a["fn"]](col)
            # driver-hash-stable output dtype: decimal sums are exact, but
            # the final column must be a dtype both Spark and DuckDB
            # clients materialize identically (double, not Decimal)
            if out_cast := a.get("out_cast"):
                agg = agg.cast(out_cast)
            aggs.append(agg.alias(a["as"]))
        df = df.groupBy(*group_by).agg(*aggs)
    if renames := config.get("renames"):
        df = df.withColumnsRenamed(renames)
    if columns := config.get("columns"):
        df = df.select(*columns)
    return df


# The catalog instance: a sensum-shaped 2-join + group-by + rename config
# (J1/J2 + A1 + F17 in one declarative plan).
SENSUM_STYLE_CONFIG = {
    "base": "customer",
    "joins": [
        {
            "table": "orders",
            "on": [["c_custkey", "o_custkey"]],
            "how": "left",
            "select": ["o_orderkey", "o_totalprice", "o_custkey"],
        },
        {
            "table": "nation",
            "on": [["c_nationkey", "n_nationkey"]],
            "how": "inner",
            "select": ["n_nationkey", "n_name"],
        },
    ],
    "group_by": ["c_custkey", "c_mktsegment", "n_name"],
    "aggs": [
        {"fn": "count", "col": "o_orderkey", "as": "n_orders"},
        {"fn": "sum", "col": "o_totalprice", "as": "total_spend", "cast": "decimal(18,2)", "out_cast": "double"},
    ],
    "renames": {"c_mktsegment": "segment"},
    "columns": ["c_custkey", "segment", "n_name", "n_orders", "total_spend"],
}


def config_driven_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entry: the SENSUM_STYLE_CONFIG plan."""
    return build_merge_plan(spark, sf_dir, SENSUM_STYLE_CONFIG)


CONFIG_DRIVEN_MERGE_SQL = """
SELECT c_custkey, c_mktsegment AS segment, n_name,
       COUNT(o_orderkey) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY c_custkey, c_mktsegment, n_name
"""
