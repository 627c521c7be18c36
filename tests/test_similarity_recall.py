"""Recall characterization for the banded-LSH scale paths.

The DuckDB oracle mirrors the banded semantics (correctness is checked
there); these tests pin the RECALL claims made in the docstrings:
- at production near-dup similarity (cos >= 0.9), the 8x6 banding catches
  every planted pair;
- on the isotropic driver corpus (LSH worst case) the measured recall is
  what the docstrings document;
- the plans contain no BroadcastNestedLoopJoin (the round-1 cartesian).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from horizon_ocr_python_spark.operators import similarity
from horizon_ocr_python_spark.operators.similarity import (
    DIM, N_BANDS, _hyperplane, banded_keys)

SF = "/root/testdata/sf0.01"


def _banded_pairs(spark, vectors):
    """Candidate pairs (ia < ib) sharing any band key, for a numpy matrix."""
    rows = [(int(i), [float(x) for x in vectors[i]]) for i in range(len(vectors))]
    emb = spark.createDataFrame(rows, "vec_id: long, v: array<double>")
    keys = banded_keys(emb)
    a, b = keys.alias("a"), keys.alias("b")
    got = (a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
                  & (F.col("a.vec_id") < F.col("b.vec_id")))
           .select(F.col("a.vec_id").alias("ia"), F.col("b.vec_id").alias("ib"))
           .distinct().collect())
    return {(r.ia, r.ib) for r in got}


class TestPlantedNearDups:
    def test_full_recall_at_production_threshold(self, spark):
        """20 clusters x 3 near-identical vectors (cos >= 0.95): every
        within-cluster pair must share a band."""
        rng = np.random.RandomState(7)
        vecs, truth = [], set()
        for c in range(20):
            base = rng.randn(DIM)
            idxs = []
            for _ in range(3):
                v = base + 0.05 * rng.randn(DIM)  # cos ~ 0.998
                idxs.append(len(vecs))
                vecs.append(v)
            truth |= {(idxs[i], idxs[j]) for i in range(3) for j in range(i + 1, 3)}
        V = np.array(vecs)
        Nn = V / np.linalg.norm(V, axis=1, keepdims=True)
        for i, j in truth:
            assert float(Nn[i] @ Nn[j]) >= 0.9
        cand = _banded_pairs(spark, V)
        missed = truth - cand
        assert not missed, f"banding missed near-dup pairs: {missed}"

    def test_hyperplanes_deterministic_and_balanced(self):
        w = _hyperplane(0, 0)
        assert w == _hyperplane(0, 0)
        assert set(w) == {1.0, -1.0} and len(w) == DIM
        # different (band, bit) -> different plane
        assert w != _hyperplane(1, 0) and w != _hyperplane(0, 1)
        # roughly balanced signs (md5 uniformity)
        assert 20 <= sum(1 for x in w if x > 0) <= 44


class TestDriverCorpusRecall:
    """Pin the documented worst-case numbers at sf0.01 so docstring claims
    stay true if constants change."""

    def test_cosine_pairs_recall_documented(self, spark):
        from horizon_ocr_python_spark.operators.compose import (
            COSINE_PAIR_THRESHOLD, embedding_cosine_pairs)

        got = {(r.ia, r.ib) for r in embedding_cosine_pairs(spark, SF).collect()}
        # exact truth via numpy
        emb = (spark.read.parquet(f"{SF}/embeddings.parquet")
               .orderBy("vec_id").collect())
        V = np.array([r.embedding for r in emb], dtype=np.float64)
        ids = [r.vec_id for r in emb]
        Nn = V / np.linalg.norm(V, axis=1, keepdims=True)
        S = np.round(Nn @ Nn.T, 4)
        truth = {(ids[i], ids[j]) for i in range(len(ids))
                 for j in range(i + 1, len(ids))
                 if S[i, j] >= COSINE_PAIR_THRESHOLD}
        assert got <= truth, "banded pairs must be a subset of exact pairs"
        assert len(got) == 9 and len(truth) == 14  # the documented 9/14

    def test_ann_topk_subset_of_exact_cosine(self, spark):
        """Every ANN hit must carry the true exact cosine (the banding only
        restricts candidates, never alters similarity)."""
        rows = similarity.lsh_ann_topk(spark, SF).collect()
        emb = {r.vec_id: np.array(r.embedding, dtype=np.float64)
               for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()}
        for r in rows:
            q, c = emb[r.q_id], emb[r.vec_id]
            true_sim = float(q @ c / (np.linalg.norm(q) * np.linalg.norm(c)))
            assert abs(round(true_sim, 4) - r.sim) <= 1e-9
        # documented: 15 rows, 8 of which coincide with the exact top-3
        exact = {(r.q_id, r.vec_id)
                 for r in similarity.cosine_topk(spark, SF).collect()}
        hits = sum(1 for r in rows if (r.q_id, r.vec_id) in exact)
        assert len(rows) == 15 and hits == 8


class TestPlanShape:
    @pytest.mark.parametrize("fn", ["embedding_cosine_pairs", "lsh_ann_topk"])
    def test_no_nested_loop_join(self, spark, fn):
        from horizon_ocr_python_spark import plans
        from horizon_ocr_python_spark.operators import compose

        df = (compose.embedding_cosine_pairs(spark, SF)
              if fn == "embedding_cosine_pairs"
              else similarity.lsh_ann_topk(spark, SF))
        plan = plans.physical_plan(df)
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


class TestIvf:
    def test_planted_clusters_full_recall(self, spark, tmp_path):
        """5 well-separated clusters; each query's true top-3 are its own
        cluster members. The sampled centroids (first 16 corpus vectors)
        include one vector per cluster, so nprobe=4 must recover 15/15."""
        rng = np.random.RandomState(11)
        centers = rng.randn(5, DIM) * 4
        rows = []
        # queries 0..4: one per cluster
        for q in range(5):
            rows.append((q, [float(x) for x in centers[q] + 0.05 * rng.randn(DIM)]))
        # corpus 5..20: the centroid seed block — one per cluster + fillers
        for i in range(16):
            c = centers[i % 5]
            rows.append((5 + i, [float(x) for x in c + 0.05 * rng.randn(DIM)]))
        # more members per cluster
        for j in range(40):
            c = centers[j % 5]
            rows.append((21 + j, [float(x) for x in c + 0.05 * rng.randn(DIM)]))
        df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>") \
            .withColumn("label", F.lit(0))
        df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")

        got = similarity.ivf_ann_topk(spark, str(tmp_path)).collect()
        V = {r[0]: np.array(r[1], dtype=np.float64) for r in rows}
        Nv = {k: v / np.linalg.norm(v) for k, v in V.items()}
        # within a cluster all members tie at ~cos 0.995+ (4dp rounding makes
        # the exact top-3 id set ambiguous), so the meaningful IVF property
        # is: every query returns a FULL top-k and every returned neighbor
        # is a true near neighbor (its own cluster, cos >= 0.9)
        per_q = {}
        for r in got:
            per_q.setdefault(r.q_id, []).append(r)
        assert set(per_q) == set(range(5))
        for q, rs in per_q.items():
            assert len(rs) == 3
            for r in rs:
                assert float(Nv[q] @ Nv[r.vec_id]) >= 0.9, (q, r.vec_id)

    def test_isotropic_recall_documented(self, spark):
        """Pin the documented worst-case number on the driver corpus."""
        ivf = {(r.q_id, r.vec_id)
               for r in similarity.ivf_ann_topk(spark, SF).collect()}
        exact = {(r.q_id, r.vec_id)
                 for r in similarity.cosine_topk(spark, SF).collect()}
        assert len(ivf) == 15 and len(ivf & exact) == 6
