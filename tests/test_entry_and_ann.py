"""entry() smoke + ANN quality checks the SQL oracle can't express."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "email" in df.columns and "name" in df.columns


def test_ivf_recall_vs_bruteforce(spark):
    """IVF with n_probe=2 over 20 label cells must reach decent recall@5
    against the exact brute-force ranking (the ANN quality contract)."""
    bf = entry_mod.q29_knn_bruteforce(spark, SF_DIR).collect()
    ivf = entry_mod.q30_knn_ivf(spark, SF_DIR).collect()
    bf_sets = {}
    for r in bf:
        bf_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = total = 0
    for r in ivf:
        total += 1
        hits += r.neighbor_id in bf_sets[r.query_id]
    recall = hits / max(total, 1)
    assert recall >= 0.3, f"IVF recall@5 too low: {recall}"
    # every IVF hit must carry the same cosine the brute-force assigns
    bf_cos = {(r.query_id, r.neighbor_id): r.cos for r in bf}
    for r in ivf:
        if (r.query_id, r.neighbor_id) in bf_cos:
            assert abs(bf_cos[(r.query_id, r.neighbor_id)] - r.cos) < 1e-9
