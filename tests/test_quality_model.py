"""C61 learned quality filter (r15): fit-behaves gates — the model must
actually LEARN (AUC/accuracy floors vs its distillation labels, majority
rate beaten), the served weights must reproduce the served scores
(model_verdicts is the D22 online-scoring path), and the fixed-point
fit must be partition-invariant (order-free integer sums)."""

from __future__ import annotations

from pyspark.sql import functions as F

from euclid_spark.operators import quality_model as qm
from tests.conftest import SF_SMOKE


def _auc(pairs: "list[tuple[float, int]]") -> float:
    """Average-rank AUC (tie-aware Mann-Whitney)."""
    n = len(pairs)
    order = sorted(range(n), key=lambda i: pairs[i][0])
    ranks = [0.0] * n
    i = 0
    while i < n:
        j = i
        while j < n and pairs[order[j]][0] == pairs[order[i]][0]:
            j += 1
        for k in range(i, j):
            ranks[order[k]] = (i + j + 1) / 2.0
        i = j
    npos = sum(y for _, y in pairs)
    nneg = n - npos
    rank_pos = sum(r for r, (_, y) in zip(ranks, pairs) if y)
    return (rank_pos - npos * (npos + 1) / 2) / (npos * nneg)


def test_fit_learns_the_labels(spark):
    """AUC ≥ 0.70 and accuracy ≥ 0.65 vs the heuristic labels, and the
    decision rule must beat always-predict-majority — the floors sit
    ~7 points under the measured values (AUC 0.786, acc 0.738 at
    sf0.001), so a fit regression trips them while corpus noise
    doesn't."""
    rows = qm.text_quality_model(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    pairs = [(r["score"], 1 if r["label"] else 0) for r in rows]
    auc = _auc(pairs)
    assert auc >= 0.70, f"AUC {auc:.4f} under floor"
    acc = sum(
        1 for r in rows if bool(r["model_keep"]) == bool(r["label"])
    ) / len(rows)
    assert acc >= 0.65, f"accuracy {acc:.4f} under floor"
    pos = sum(1 for r in rows if r["label"]) / len(rows)
    majority = max(pos, 1 - pos)
    assert acc > majority, f"acc {acc:.4f} ≤ majority rate {majority:.4f}"


def test_prob_is_hard_sigmoid_of_score(spark):
    """prob must equal clamp(score/4 + 1/2, 0, 1) at output precision —
    the serving contract a downstream threshold consumer relies on."""
    for r in qm.text_quality_model(spark, SF_SMOKE).collect():
        want = min(1.0, max(0.0, r["score"] / 4 + 0.5))
        assert abs(r["prob"] - want) < 5e-6, (r["score"], r["prob"], want)


def test_served_weights_reproduce_verdicts(spark):
    """Scoring arbitrary docs against the SERVED (b, w, m) artifact —
    the D22 online path — must reproduce the batch face's keep verdict
    doc-for-doc (offline-trained ≡ online-served)."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    model = qm.quality_model_weights(spark, SF_SMOKE)
    online = {
        r["doc_id"]: bool(r["model_keep"])
        for r in qm.model_verdicts(spark, docs, model).collect()
    }
    batch = {
        r["doc_id"]: bool(r["model_keep"])
        for r in qm.text_quality_model(spark, SF_SMOKE).collect()
    }
    assert online == batch


def test_fit_partition_invariant(spark):
    """The fixed-point gradient sums are order-free integers, so the
    fitted weights must be BIT-IDENTICAL whatever the corpus partition
    layout (the r9 partition-invariance discipline)."""
    import os
    import tempfile

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "docs13.parquet")
        docs.repartition(13).write.parquet(path)
        feats_a = qm._qm_features(docs)
        feats_b = qm._qm_features(spark.read.parquet(path))
        labels = qm._qm_labels(spark, SF_SMOKE)
        n = labels.count()
        wa = qm._fit(spark, feats_a, labels, n)
        wb = qm._fit(spark, feats_b, labels, n)
        assert wa == wb


def test_calibration_report_internally_consistent(spark):
    """C61c: deciles partition the corpus (Σn = corpus size), every
    bucket's mean_prob sits inside its decile edges, and the reported
    ECE equals the Σ n·|gap|/N recomputed from the report's own rows."""
    rep = qm.text_quality_model_calibration(spark, SF_SMOKE).collect()
    assert rep
    n_total = sum(r["n_docs"] for r in rep)
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert n_total == n_docs
    eces = {r["ece"] for r in rep}
    assert len(eces) == 1  # repeated per row, one value
    micros = 1_000_000
    recomputed = round(
        sum(r["n_docs"] * abs(r["mean_prob"] - r["frac_pos"]) for r in rep)
        / n_total,
        5,
    )
    assert abs(eces.pop() - recomputed) < 2e-5
    for r in rep:
        lo, hi = r["bucket"] / 10.0, (r["bucket"] + 1) / 10.0
        if r["bucket"] == 9:
            hi = 1.0 + 1e-9
        assert lo - 1e-9 <= r["mean_prob"] <= hi + 1e-9, r
        assert 0.0 <= r["frac_pos"] <= 1.0
