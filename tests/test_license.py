"""License detection (functions/license.py): SPDX extraction, phrase
fallback, family classification precedence, and the report rollup."""

from __future__ import annotations

from pyspark.sql import functions as F

from g_data_pipeline_spark.functions.license import (
    detected_license,
    license_family,
    license_report,
    phrase_license,
    spdx_id,
)

DOCS = [
    (1, "SPDX-License-Identifier: MIT\ndef f(): pass"),
    (2, "SPDX-License-Identifier: Apache-2.0\ncode"),
    (3, "SPDX-License-Identifier: GPL-3.0-only\ncode"),
    (4, "SPDX-License-Identifier: LGPL-3.0-or-later\ncode"),
    (5, "SPDX-License-Identifier: AGPL-3.0\ncode"),
    (6, "// Permission is hereby granted, free of charge, to anyone\ncode"),
    (7, "# This file is under the GNU General Public License v3\ncode"),
    (8, "# GNU Lesser General Public License applies\ncode"),
    (9, "Redistribution and use in source and binary forms, with or "
        "without modification, are permitted\ncode"),
    (10, "Copyright (c) 2024 Example Corp\ncode"),
    (11, "plain code, no license text at all"),
    # SPDX wins over a conflicting phrase
    (12, "SPDX-License-Identifier: MIT\n"
         "This program is under the GNU General Public License\ncode"),
    (13, "SPDX-License-Identifier: WTFPL\ncode"),  # detected, unclassified
]


def _col(spark, col):
    df = spark.createDataFrame(DOCS, "id long, text string")
    return {r.id: r.v for r in df.select(F.col("id"), col.alias("v")).collect()}


def test_spdx_and_phrase_detection(spark):
    got = _col(spark, detected_license("text"))
    assert got[1] == "MIT" and got[2] == "Apache-2.0"
    assert got[3] == "GPL-3.0-only" and got[4] == "LGPL-3.0-or-later"
    assert got[6] == "MIT" and got[7] == "GPL-3.0"
    assert got[8] == "LGPL-3.0"           # LGPL phrase beats GPL substring
    assert got[9] == "BSD-3-Clause"
    assert got[10] is None and got[11] is None
    assert got[12] == "MIT"               # declared tag wins over phrase
    assert got[13] == "WTFPL"


def test_family_classification(spark):
    fam = _col(spark, license_family("text"))
    assert fam[1] == fam[2] == fam[6] == fam[9] == "permissive"
    assert fam[3] == fam[5] == fam[7] == "copyleft"
    assert fam[4] == fam[8] == "weak_copyleft"
    assert fam[10] == fam[11] == "none"
    assert fam[13] == "unknown"


def test_report_rollup_and_keep_flag(spark):
    df = spark.createDataFrame(DOCS, "id long, text string")
    rep = {r.license_family: r for r in license_report(df, "text").collect()}
    perm = rep["permissive"]
    assert perm.n_docs == 5 and perm.n_spdx_tagged == 3
    assert perm.n_phrase_only == 2 and perm.train_keep
    assert rep["copyleft"].n_docs == 3 and not rep["copyleft"].train_keep
    assert rep["none"].n_docs == 2 and rep["none"].train_keep
    assert not rep["unknown"].train_keep


def test_phrase_only_null_on_clean_text(spark):
    got = _col(spark, phrase_license("text"))
    assert got[11] is None
    got_spdx = _col(spark, spdx_id("text"))
    assert got_spdx[11] is None and got_spdx[6] is None
