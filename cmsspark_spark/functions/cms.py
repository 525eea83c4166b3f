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
    """Extract the human CN from an X509 DN, matching the reference's
    semantics exactly (degraded/data_aggregation.py:389-397 + NUM_PAT
    at :30):

    1. keep only the text before the first ``&`` (proxy suffix strip);
    2. of the ``/``-separated segments starting with ``CN=``, skip those
       whose body starts with a digit (``NUM_PAT = ^CN=[0-9]``) and take
       the LAST survivor's last ``=``-separated part
       (``/CN=user/CN=111/CN=First Last`` → ``First Last``);
    3. if no CN segment survives, return the whole (``&``-stripped) DN
       with any ``CN=`` occurrences removed.

    Nulls stay null (the reference str()-ifies; we keep SQL null
    semantics so joins/groups behave).
    """
    c = F.col(dn) if isinstance(dn, str) else dn
    stripped = F.substring_index(c, "&", 1)
    # Prepend '/' so a DN without a leading slash still anchors its
    # first segment; greedy .* makes regexp_extract take the LAST
    # /CN= whose body does not start with a digit.
    padded = F.concat(F.lit("/"), stripped)
    body = F.regexp_extract(padded, r".*/CN=((?![0-9])[^/]*)", 1)
    name = F.substring_index(body, "=", -1)
    has_cn = padded.rlike(r"/CN=(?![0-9])")
    fallback = F.regexp_replace(stripped, "CN=", "")
    return F.when(has_cn, name).otherwise(fallback)


def anonymize(col: Column | str) -> Column:
    """Irreversible column anonymization via md5 (reference
    hdfs_an.py:23-42's row-level md5 anonymizer, as a column expr).
    Nulls stay null so join/group semantics survive anonymization."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("string"))


def dn2uuid(dn: Column | str) -> Column:
    """Stable 16-digit numeric id from a DN, bit-identical to the
    reference: ``int(sha1(parse_dn(dn)).hexdigest(), 16) % 10**16``
    (degraded/data_aggregation.py:418-420 — note it hashes the PARSED
    DN, not the raw string).

    The full 160-bit digest mod 10**16 is computed as an unrolled
    chunked-mod fold over the 40 hex chars in five 8-hex (32-bit)
    chunks: ``acc = (acc * 2^32 + chunk) % 10^16``. Intermediate
    values stay < 10^16 * 2^32 ≈ 4.3e25, exact in decimal(38,0), so
    the fold never overflows and stays a pure codegen expression.
    """
    c = F.col(dn) if isinstance(dn, str) else dn
    hexd = F.sha1(parse_dn(c))
    dec = "decimal(38,0)"
    base = F.lit(2**32).cast(dec)
    mod = F.lit(10**16).cast(dec)
    acc = F.lit(0).cast(dec)
    for i in range(5):
        chunk = F.conv(F.substring(hexd, i * 8 + 1, 8), 16, 10).cast(dec)
        acc = (acc * base + chunk) % mod
    return acc.cast("long")


def parse_kv_record(
    col: Column | str, pair_sep: str = "&", kv_sep: str = "="
) -> Column:
    """EOS-style ``k=v&k=v&…`` record string → ``map<string,string>``.

    The reference's EOS reader documents this raw-string record format
    (spark_utils.py:552-566: the whole measurement squashed into one
    ``data`` string) and parses it with per-row Python string splits
    downstream. ``str_to_map`` keeps it a single Catalyst expression:
    JVM-side, null-safe, and usable as the per-era normalizer of a
    ``VersionedSource`` (``m['path']``, ``m['rb']`` projections).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.str_to_map(c, F.lit(pair_sep), F.lit(kv_sep))


def rse_tags(rse: Column | str) -> dict[str, Column]:
    """RSE name → (rse_tier, rse_country, rse_kind) tag columns
    (rucio_ds_summary.py:75-84, rucio_datasets_monitoring.py:167-189):
    tier and country are the first two ``_``-separated segments
    (T1_US_FNAL_Disk → T1, US); kind is 'temp'/'test' when the name
    ends with any case variant of Temp/Test, else 'prod'. Pure column
    expressions — endswith chains exactly as the reference's
    when-cascade, so Temp/temp/TEMP all tag 'temp'."""
    c = F.col(rse) if isinstance(rse, str) else rse
    parts = F.split(c, "_")
    kind = (
        F.when(
            c.endswith("Temp") | c.endswith("temp") | c.endswith("TEMP"),
            F.lit("temp"),
        )
        .when(
            c.endswith("Test") | c.endswith("test") | c.endswith("TEST"),
            F.lit("test"),
        )
        .otherwise(F.lit("prod"))
    )
    return {
        "rse_tier": parts.getItem(0),
        "rse_country": parts.getItem(1),
        "rse_kind": kind,
    }
