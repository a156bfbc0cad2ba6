"""Scalar string/regex functions (SURVEY §2.7).

Reference parity (citations into /root/reference/):
- F1 REGEXP_SUBSTR             epa_ingestion.py:496, 824 -> ``regexp_substr``
- F2 '%' || col concat         epa_ingestion.py:773      -> plain F.concat
- F4 scoped file URL           epa_ingestion.py:758      -> ``scoped_file_url``
- F5 clean_filename            epa_ingestion.py:523-532  -> ``clean_filename``
- F6 uppercase column rename   epa_ingestion.py:325 etc. -> ``upper_columns``
- F7 timestamp formatting      epa_ingestion.py:693      -> ``format_now``

All are column-expression builders (JVM-side, codegen'd) — no Python UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def regexp_substr(col: Column, pattern: str) -> Column:
    """F1: Snowflake REGEXP_SUBSTR returns NULL on miss; Spark's
    ``regexp_extract`` returns ''. ``nullif`` restores NULL-on-miss."""
    return F.nullif(F.regexp_extract(col, pattern, 0), F.lit(""))


def like_suffix(col: Column, suffix: Column) -> Column:
    """P6: ``col LIKE '%' || suffix``. ``endswith`` is the literal-safe
    form (a suffix containing %/_ would change LIKE semantics —
    SURVEY §7 hard-part 3)."""
    return col.endswith(suffix)


def clean_filename(col: Column, max_len: int = 200) -> Column:
    r"""F5: strip ``<>:"/\|?*``, spaces -> ``_``, truncate (epa_ingestion.py:523-532)."""
    cleaned = F.regexp_replace(col, r'[<>:"/\\|?*]', "")
    underscored = F.regexp_replace(cleaned, r"\s+", "_")
    return F.substring(underscored, 1, max_len)


def scoped_file_url(base: str, relative_path: Column) -> Column:
    """F4: build_scoped_file_url analog — deterministic URL from stage base
    + relative path (epa_ingestion.py:758)."""
    return F.concat_ws("/", F.lit(base.rstrip("/")), relative_path)


def upper_columns(df: DataFrame) -> DataFrame:
    """F6: ``df.columns.str.upper()`` discipline (epa_ingestion.py:325)."""
    return df.toDF(*[c.upper() for c in df.columns])


def format_now() -> Column:
    """F7: ``datetime.now().strftime('%Y-%m-%d %H:%M:%S')`` equivalent."""
    return F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss")
