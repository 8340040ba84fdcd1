"""License detection for code/corpus curation — the PRIMARY gate of
The Stack / StarCoder-style code datasets (Kocetkov et al. '22: only
permissively-licensed files enter training). Two complementary
detectors, both pure JVM regexp expressions (scan-stage, zero shuffle):

- SPDX tags: ``SPDX-License-Identifier: <id>`` (the machine-readable
  convention SPDX 2.x standardizes) — extracted verbatim;
- header phrases: the distinctive first lines of the common license
  texts (MIT's "permission is hereby granted, free of charge", the GPL
  family preambles, BSD's redistribution clause, Apache's "licensed
  under the apache license", MPL) matched on lowercased text.

Classification into families follows public SPDX metadata: permissive
(MIT/Apache/BSD/ISC/Unlicense/Zlib/CC0), weak copyleft (LGPL/MPL/EPL/
CDDL), copyleft (GPL/AGPL), public domain, none/unknown. The SPDX tag
wins over phrase evidence when both appear (it is the declared intent).

Every regex is shared verbatim with the DuckDB oracle twin
(query_defs/curation9.py t_license_detect) — plain character classes
only, no engine-specific syntax.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPDX_RE = r"SPDX-License-Identifier: *([A-Za-z0-9.+-]+)"

# (phrase regex on lower(text), detected id) — first match wins, ordered
# most-specific first (AGPL/LGPL before GPL).
PHRASE_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"gnu affero general public license", "AGPL-3.0"),
    (r"gnu lesser general public license", "LGPL-3.0"),
    (r"gnu general public license", "GPL-3.0"),
    (r"permission is hereby granted, free of charge", "MIT"),
    (r"licensed under the apache license", "Apache-2.0"),
    (r"redistribution and use in source and binary forms", "BSD-3-Clause"),
    (r"mozilla public license", "MPL-2.0"),
    (r"this is free and unencumbered software released into the public domain",
     "Unlicense"),
)

# license-id prefix -> family (checked in order; AGPL/LGPL before GPL)
FAMILY_PREFIXES: tuple[tuple[str, str], ...] = (
    ("AGPL", "copyleft"),
    ("LGPL", "weak_copyleft"),
    ("GPL", "copyleft"),
    ("MPL", "weak_copyleft"),
    ("EPL", "weak_copyleft"),
    ("CDDL", "weak_copyleft"),
    ("MIT", "permissive"),
    ("Apache", "permissive"),
    ("BSD", "permissive"),
    ("ISC", "permissive"),
    ("Zlib", "permissive"),
    ("CC0", "public_domain"),
    ("Unlicense", "public_domain"),
)

PERMISSIVE_FAMILIES = ("permissive", "public_domain", "none")


def spdx_id(col: Column | str) -> Column:
    """The SPDX tag's license id, or NULL when untagged (regexp_extract
    returns '' on no match — normalized to NULL)."""
    c = F.col(col) if isinstance(col, str) else col
    raw = F.regexp_extract(c, SPDX_RE, 1)
    return F.when(raw != "", raw)


def phrase_license(col: Column | str) -> Column:
    """License id inferred from header phrases (first pattern that
    matches lower(text)), or NULL."""
    c = F.col(col) if isinstance(col, str) else col
    lowered = F.lower(c)
    expr = F.lit(None).cast("string")
    for pattern, lic in reversed(PHRASE_PATTERNS):
        expr = F.when(lowered.rlike(pattern), F.lit(lic)).otherwise(expr)
    return expr


def detected_license(col: Column | str) -> Column:
    """SPDX tag if present, else phrase evidence, else NULL."""
    return F.coalesce(spdx_id(col), phrase_license(col))


def license_family(col: Column | str) -> Column:
    """Family of :func:`detected_license`: permissive / weak_copyleft /
    copyleft / public_domain / unknown (detected but unclassified) /
    none (no license evidence at all)."""
    lic = detected_license(col)
    expr = F.lit("unknown")
    for prefix, fam in reversed(FAMILY_PREFIXES):
        expr = F.when(lic.startswith(prefix), F.lit(fam)).otherwise(expr)
    return F.when(lic.isNull(), F.lit("none")).otherwise(expr)


def license_report(
    df: DataFrame, text_col: str = "text", group_cols: list[str] | None = None
) -> DataFrame:
    """Per-(group, family) rollup: doc count, SPDX-tagged count,
    phrase-only count, and the train-set keep flag (The Stack keeps
    permissive + public-domain; untagged 'none' rows pass to the next
    gate rather than being license-blocked). One aggregate; detection is
    scan-stage."""
    fam = license_family(text_col)
    base = df.select(
        *(group_cols or []),
        fam.alias("license_family"),
        spdx_id(text_col).isNotNull().cast("int").alias("__spdx"),
        (
            spdx_id(text_col).isNull()
            & phrase_license(text_col).isNotNull()
        )
        .cast("int")
        .alias("__phrase_only"),
    )
    keys = [*(group_cols or []), "license_family"]
    return base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__spdx").cast("long").alias("n_spdx_tagged"),
        F.sum("__phrase_only").cast("long").alias("n_phrase_only"),
        F.max(
            F.col("license_family").isin(*PERMISSIVE_FAMILIES).cast("int")
        )
        .cast("boolean")
        .alias("train_keep"),
    )
