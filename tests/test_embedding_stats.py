"""Distributed covariance / PCA over the embeddings table.

Covariance: same SQL oracle as the driver gate (DuckDB covar_pop).
PCA: eigen-identity and block-count invariance of the Gram reduction.
"""

import duckdb
import numpy as np
import pandas as pd

from dtaidistance_ray.stages import ann

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


class TestEmbeddingStats:
    def test_covariance_vs_duckdb(self, ray_session):
        got = _canon(ann.embedding_covariance(SF))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
        )
        want = _canon(con.execute(ann.EMB_COVARIANCE_SQL).df())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_pca_eigen_identity(self, ray_session):
        """cov @ v == lambda * v for every returned component, and
        components are orthonormal with descending variance."""
        k = 3
        pcs = ann.pca_top_components(SF, k=k)
        _, _, cov = ann._cov_reduce(SF)
        prev = np.inf
        vecs = []
        for comp, g in pcs.groupby("component"):
            g = g.sort_values("pos")
            v = g["loading"].to_numpy()
            lam = g["variance"].iloc[0]
            assert np.linalg.norm(cov @ v - lam * v) < 1e-4
            assert abs(np.linalg.norm(v) - 1.0) < 1e-4
            assert lam <= prev + 1e-12
            prev = lam
            vecs.append(v)
        gram = np.array(vecs) @ np.array(vecs).T
        assert np.allclose(gram, np.eye(k), atol=1e-4)

    def test_cov_reduce_threshold_invariance(self, ray_session, monkeypatch):
        """Tree-merge rounds (threshold=1) must not change the result."""
        from dtaidistance_ray.stages import rollup_scan as _rs

        base = _canon(ann.embedding_covariance(SF))
        monkeypatch.setattr(_rs, "_MERGE_THRESHOLD_ROWS", 1)
        treed = _canon(ann.embedding_covariance(SF))
        pd.testing.assert_frame_equal(base, treed)
