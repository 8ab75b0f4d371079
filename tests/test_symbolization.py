"""SymbolAlignment parity (align2 + hangover) vs the reference."""

import numpy as np
import pytest

from dtaidistance_ray.stages.symbolization import SymbolAlignment

ref_mod = pytest.importorskip("dtaidistance.symbolization.alignment")


def _mk_data():
    rng = np.random.default_rng(5)
    x = np.linspace(0, 2 * np.pi, 20)
    codebook = [np.sin(x), np.cos(x), np.linspace(-1, 1, 20)]
    series = np.zeros((3, 80))
    for i in range(3):
        series[i] = rng.normal(scale=0.05, size=80)
        series[i, 10:30] += codebook[i % 3]
        series[i, 50:70] += codebook[(i + 1) % 3]
    return codebook, series


class TestSymbolAlignment:
    def test_align2_parity(self):
        codebook, series = _mk_data()
        ours = SymbolAlignment(codebook).align2(series)
        theirs = ref_mod.SymbolAlignment(codebook).align2(series)
        np.testing.assert_array_equal(ours, theirs)

    def test_hangover_parity(self):
        codebook, series = _mk_data()
        our_sa = SymbolAlignment(codebook)
        sym = our_sa.align2(series)
        ref_sa = ref_mod.SymbolAlignment(codebook)
        ref_sym = ref_sa.align2(series)
        s1, i1 = our_sa.hangover(sym, threshold=4)
        s2, i2 = ref_sa.hangover(ref_sym, threshold=4)
        assert s1 == s2
        assert i1 == i2

    def test_align_places_codewords(self):
        codebook, series = _mk_data()
        sym = SymbolAlignment(codebook).align(series, max_rangefactor=3)
        # the planted codeword regions should mostly carry a real symbol
        assert (sym[0, 12:28] != len(codebook)).mean() > 0.5


class TestSymbolizerStage:
    def test_stage_runs(self, ray_session):
        from dtaidistance_ray.sources.synth import TokenTableSpec
        from dtaidistance_ray.stages.symbolization import symbolize_tokens

        spec = TokenTableSpec(num_rows=100, max_len=48)
        out = symbolize_tokens(spec, codebook_size=3, n_docs=12).to_pandas()
        assert len(out) == 12
        assert all(len(s) > 0 for s in out["symbols"])
