"""CMS-domain column expressions replacing the reference's Python UDFs.

Reference sites (all in /root/reference/src/python/CMSSpark/):
- ``split_dataset``   — spark_utils.py:727-733 (dataset → primds/procds/tier)
- ``clean_site_name`` — degraded/data_aggregation.py:374-387
- ``parse_dn``        — degraded/data_aggregation.py:389-397 (X509 DN → CN)
- ``dn2uuid``         — degraded/data_aggregation.py:418-420 (sha1 → 16-digit id)
- ``tier_from_site``  — degraded/data_aggregation.py:399-407

All are pure column expressions: they stay inside whole-stage codegen and
never cross the JVM↔Python boundary (the reference's UDFs defeat codegen,
SURVEY §4 O11).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def split_dataset_col(dataset: Column | str) -> tuple[Column, Column, Column]:
    """CMS dataset name ``/primds/procds/tier`` → (primds, procds, tier).

    The leading ``/`` makes getItem(0) empty; components are items 1..3
    (off-by-one here breaks every popularity report — SURVEY §7.4).
    """
    parts = F.split(F.col(dataset) if isinstance(dataset, str) else dataset, "/")
    return parts.getItem(1), parts.getItem(2), parts.getItem(3)


def split_dataset(df: DataFrame, dataset_col: str = "dataset") -> DataFrame:
    """Add primds/procds/tier columns (reference spark_utils.py:727-733)."""
    primds, procds, tier = split_dataset_col(dataset_col)
    return (
        df.withColumn("primds", primds)
        .withColumn("procds", procds)
        .withColumn("tier", tier)
    )


def clean_site_name(site: Column | str) -> Column:
    """Trim a site name to its first three ``_``-separated parts.

    ``T2_CH_CERN_HLT`` → ``T2_CH_CERN`` (reference
    degraded/data_aggregation.py:374-387, which special-cases >3 parts).
    """
    c = F.col(site) if isinstance(site, str) else site
    parts = F.split(c, "_")
    return F.when(
        F.size(parts) > 3,
        F.concat_ws("_", parts.getItem(0), parts.getItem(1), parts.getItem(2)),
    ).otherwise(c)


def tier_from_site(site: Column | str) -> Column:
    """Site tier prefix: ``T2_CH_CERN`` → ``T2``."""
    c = F.col(site) if isinstance(site, str) else site
    return F.split(c, "_").getItem(0)


def parse_dn(dn: Column | str) -> Column:
    """Extract the human CN from an X509 DN.

    ``/DC=ch/DC=cern/OU=Users/CN=user1/CN=111/CN=First Last`` → the last
    CN segment that is not purely numeric and not a 'user…' login
    (reference degraded/data_aggregation.py:389-397 takes the last CN).
    """
    c = F.col(dn) if isinstance(dn, str) else dn
    # Last CN= segment in the DN.
    return F.regexp_extract(c, r"/CN=([^/]+)$", 1)


def anonymize(col: Column | str) -> Column:
    """Irreversible column anonymization via md5 (reference
    hdfs_an.py:23-42's row-level md5 anonymizer, as a column expr).
    Nulls stay null so join/group semantics survive anonymization."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("string"))


def dn2uuid(dn: Column | str) -> Column:
    """Stable 16-digit numeric id from a DN via sha1.

    The reference hashes with ``hashlib.sha1`` then keeps digits
    (degraded/data_aggregation.py:418-420: int(sha1hex, 16) % 10**16).
    Pure-SQL equivalent: take the low 13 hex digits (< 2^53, exact in
    Long) of the sha1 and mod 10**16 — deterministic and codegen-friendly.
    """
    c = F.col(dn) if isinstance(dn, str) else dn
    return F.conv(F.substring(F.sha1(c), 28, 13), 16, 10).cast("long") % F.lit(10**16).cast(
        "long"
    )
