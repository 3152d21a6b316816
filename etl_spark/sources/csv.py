"""CSV scan dialects (SURVEY.md §2.1).

Each reader is a thin declarative wrapper over ``spark.read.csv`` so
Catalyst keeps pushdown/pruning; the only imperative path is the
byte-repair scan (S5), which runs as a line-level DataFrame transform
(``spark.read.text`` + expressions + ``from_csv``) — still whole-stage
codegen, no Python in the loop.

Reference parity:
- S1 ``;``-separated, ``,``-decimal (``src/sensum/sensum.py:65``)
- S2 pruned + date-parsed + na control (``src/jobs/ydelsesrefusion.py:53-54``)
- S3 headerless, imposed all-string schema (``src/byggesager/byggesager.py:23-26,36``)
- S4 tab-separated, cp1252, explicit names/dtypes (``src/logiva_signflow.py:43-51``)
- S5 byte-level repair: strip ``=``-prefixed Excel quoting, synthesize
  missing header cells (``src/jobs/indkoebsdata.py:71-134``)
- S6 multi-file concat with per-file headers (``src/jobs/indkoebsdata.py:118-134``)
  — native: pass a list/glob of paths, Spark handles headers per file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv_danish(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    decimal_columns: list[str] | None = None,
) -> DataFrame:
    """S1: ``;``-separated, header row, comma decimal separator. Decimal
    columns are read as strings and converted (``,`` -> ``.``) so the
    cast is explicit and locale-independent."""
    reader = spark.read.option("sep", ";").option("header", True)
    df = reader.schema(schema).csv(path) if schema is not None else reader.csv(path)
    for c in decimal_columns or []:
        df = df.withColumn(c, F.replace(F.col(c), F.lit(","), F.lit(".")).cast("double"))
    return df


def read_csv_pruned(
    spark: SparkSession,
    path: str,
    columns: list[str],
    date_columns: dict[str, str] | None = None,
) -> DataFrame:
    """S2: column-pruned scan with per-column date parsing and empty-string
    (not null) semantics — ``na_filter=False`` analog via nullValue."""
    df = (
        spark.read.option("sep", ";")
        .option("header", True)
        .option("nullValue", "\u0000")  # nothing maps to null; '' stays ''
        .csv(path)
        .select(*columns)
    )
    # univocity still yields null for unquoted-empty cells; restore the
    # na_filter=False contract ('' stays '') on the string columns
    df = df.na.fill("", [c for c, typ in df.dtypes if typ == "string"])
    for c, fmt in (date_columns or {}).items():
        # try_to_date, not to_date: under Spark 4's default ANSI mode a
        # plain to_date THROWS on the empty cells this reader just
        # restored (na_filter=False contract) — the pandas analog yields
        # NaT, so unparseable/empty dates become null, not a job abort
        df = df.withColumn(c, F.try_to_date(F.col(c), fmt))
    return df


def read_csv_headerless(spark: SparkSession, path: str, column_names: list[str]) -> DataFrame:
    """S3: headerless, imposed names, all-string schema (the reference's
    ``header=None`` + ``astype(str)``)."""
    schema = T.StructType([T.StructField(n, T.StringType(), True) for n in column_names])
    return spark.read.option("sep", ";").option("header", False).schema(schema).csv(path)


def read_csv_tab(
    spark: SparkSession, path: str, schema: T.StructType, encoding: str = "iso-8859-1"
) -> DataFrame:
    """S4: tab-separated, legacy-single-byte-encoded, explicit schema.

    Spark 4 allows only a charset whitelist; iso-8859-1 covers the
    reference's cp1252 exports except the 0x80-0x9F block (set
    ``spark.sql.legacy.javaCharsets=true`` and pass ``cp1252`` if those
    bytes matter)."""
    return (
        spark.read.option("sep", "\t")
        .option("header", False)
        .option("encoding", encoding)
        .schema(schema)
        .csv(path)
    )


def _repair_lines(raw: DataFrame) -> DataFrame:
    """The byte-repair rule as pure expressions: drop ``="..."`` Excel
    wrapping, then stray double quotes."""
    return raw.select(
        F.regexp_replace(F.regexp_replace(F.col("value"), r'="([^"]*)"', r"$1"), '"', "").alias("line")
    )


def read_csv_repaired(
    spark: SparkSession,
    path: str | list[str],
    sep: str = ";",
    n_columns: int | None = None,
) -> DataFrame:
    """S5 (x S6): byte-level repair scan, single file or a list of files.
    Handles the reference's broken exports: ``="0123"`` Excel-quoted
    cells, stray double quotes, and header rows with missing trailing
    names (synthesized as ``n/a 1..k``). The multi-file form repairs then
    concatenates, dropping each file's own header line — the reference's
    repair-and-append loop (``src/jobs/indkoebsdata.py:118-134``).

    Runs as ``spark.read.text`` -> expression repair -> ``from_csv``:
    fully distributed, no Python row loop. The header is resolved from
    the first line of the first file on the driver — one tiny read. The
    schema comes from the FIRST file (the reference appends subsequent
    frames under the first file's columns); a later file with fewer cells
    parses its missing trailing columns as null.

    Per-file header drop uses the single-file invariant (partition 0 of a
    one-file text read starts at byte 0, so the header is exactly row
    ``monotonically_increasing_id() == 0``) applied file-by-file before
    the union — correct even when files are byte-identical or a header
    string reappears as a data row. Broken legacy exports arrive as a
    handful of driver-named files, so the per-file plan loop is bounded
    by the caller's path list, never by data volume.
    """
    paths = [path] if isinstance(path, str) else list(path)
    first = _repair_lines(spark.read.text(paths[0]))
    header_row = first.first()
    if header_row is None:
        raise ValueError(
            f"read_csv_repaired: {paths[0]!r} has no header line (empty "
            "file) — the schema comes from the first file, so pass a "
            "non-empty file first"
        )
    header_line = header_row["line"]
    names = [h.strip() for h in header_line.split(sep)]
    if n_columns is not None and len(names) < n_columns:
        names += [f"n/a {i + 1}" for i in range(n_columns - len(names))]
    names = [n if n else f"n/a {i + 1}" for i, n in enumerate(names)]
    ddl = ", ".join(f"`{n}` STRING" for n in names)

    bodies = []
    for i, p in enumerate(paths):
        # reuse the header probe's frame for file 0 — building it again
        # would scan the first file's text source twice per action
        fixed = first if i == 0 else _repair_lines(spark.read.text(p))
        bodies.append(
            fixed.withColumn("__idx", F.monotonically_increasing_id())
            .filter(F.col("__idx") != 0)
            .drop("__idx")
        )
    body = bodies[0]
    for b in bodies[1:]:
        body = body.unionByName(b)
    parsed = body.select(F.from_csv(F.col("line"), ddl, {"sep": sep}).alias("r")).select("r.*")
    return parsed


def read_config_csv(spark: SparkSession, path: str, sep: str = ";") -> DataFrame:
    """S18 config scan (``src/jobs/sd_delta.py:28-29``): a small ``;``-CSV
    of configuration rows, every string cell whitespace-trimmed
    (pandas ``skipinitialspace`` + ``.map(strip)`` analog). Config tables
    are tiny by nature — broadcastable dims for the filters/joins they
    feed."""
    df = spark.read.option("sep", sep).option("header", True).csv(path)
    df = df.toDF(*[c.strip() for c in df.columns])  # header cells trim too
    return df.select(
        *[F.trim(F.col(c)).alias(c) if typ == "string" else F.col(c) for c, typ in df.dtypes]
    )


def split_by_predicate(df: DataFrame, predicate: str) -> tuple[DataFrame, DataFrame]:
    """The reference's paired ``.query(p)`` / ``.query(not p)`` split
    (excluded institutions vs excluded departments) as one scan with two
    filters — Catalyst shares the cached/broadcast config scan."""
    return df.filter(F.expr(predicate)), df.filter(~F.expr(predicate))


def read_csv_multifile(
    spark: SparkSession, paths: list[str], header: bool = True, sep: str = ";"
) -> DataFrame:
    """S6: multi-file scan; Spark skips each file's header natively (the
    reference hand-looped ``copyfileobj`` + readline-skip)."""
    return spark.read.option("sep", sep).option("header", header).csv(paths)
