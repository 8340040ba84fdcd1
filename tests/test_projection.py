"""Sign random projection (operators/projection.py) — pinned against
what JL actually guarantees:

- distance ratios are UNBIASED with concentration ~ sqrt(2/k) (the
  fixture embeddings are structureless — label purity of exact top-10 is
  at chance — so top-k recall there is meaningless; ratios are not);
- cluster structure, where it EXISTS, survives: on planted clusters the
  nearest-center assignment is preserved through a 64→16 projection;
- same seed ⇒ bit-identical reprojection (the no-stored-matrix
  contract); different seed ⇒ different projection;
- plan is pure expressions: zero shuffles, zero Python nodes.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.projection import srp_project

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _mat(rows, col):
    return np.array([r[col] for r in rows])


def test_distance_ratios_unbiased_and_concentrating(spark, emb):
    stats = {}
    for k in (16, 32):
        rows = srp_project(emb, "embedding", k).collect()
        v, p = _mat(rows, "embedding"), _mat(rows, "projected")
        rng = np.random.default_rng(0)
        idx = rng.choice(len(v), (400, 2))
        idx = idx[idx[:, 0] != idx[:, 1]]
        dv = np.linalg.norm(v[idx[:, 0]] - v[idx[:, 1]], axis=1)
        dp = np.linalg.norm(p[idx[:, 0]] - p[idx[:, 1]], axis=1)
        r = (dp / dv) ** 2
        stats[k] = (r.mean(), r.std())
        assert 0.9 < r.mean() < 1.1, (k, r.mean())  # unbiased
        assert r.std() < 1.5 * math.sqrt(2 / k), (k, r.std())
    # doubling k tightens the estimate
    assert stats[32][1] < stats[16][1]


def test_planted_clusters_survive_projection(spark):
    rnd = random.Random(7)
    centers = [
        [rnd.gauss(0, 1) for _ in range(64)] for _ in range(10)
    ]
    rows = []
    for i in range(300):
        c = i % 10
        rows.append(
            (i, c, [x + rnd.gauss(0, 0.15) for x in centers[c]])
        )
    df = spark.createDataFrame(
        rows, "vec_id long, cluster int, embedding array<double>"
    )
    got = srp_project(df, "embedding", 16).collect()
    p = _mat(got, "projected")
    labels = np.array([r["cluster"] for r in got])
    pc = np.array(
        [np.mean(p[labels == c], axis=0) for c in range(10)]
    )
    assign = np.argmin(
        np.linalg.norm(p[:, None, :] - pc[None, :, :], axis=2), axis=1
    )
    assert np.mean(assign == labels) > 0.95


def test_seed_contract_and_zero_vector(spark, emb):
    a = srp_project(emb, "embedding", 16, seed=1).select("projected").collect()
    b = srp_project(emb, "embedding", 16, seed=1).select("projected").collect()
    c = srp_project(emb, "embedding", 16, seed=2).select("projected").collect()
    assert [r["projected"] for r in a] == [r["projected"] for r in b]
    assert [r["projected"] for r in a] != [r["projected"] for r in c]
    z = spark.createDataFrame(
        [(1, [0.0] * 64)], "id long, v array<double>"
    )
    out = srp_project(z, "v", 8).collect()[0]["projected"]
    assert out == [0.0] * 8


def test_plan_zero_shuffle_pure_expressions(spark, emb):
    plan = (
        srp_project(emb, "embedding", 16)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    tree = plan.split("(1) Scan")[0]
    assert "Exchange" not in tree
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan