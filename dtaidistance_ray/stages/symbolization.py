"""Symbolization: continuous series -> discrete symbols via a codebook
of motifs (reference symbolization/alignment.py:10-195).

Per (series, codeword) subsequence alignment; align2 aggregates per
time step (argmin over codewords), align is the matching-pursuit-style
non-overlapping selection; hangover run-length filters the symbol
stream. The codebook is the stateful-tokenizer analogue: the Ray stage
holds it per actor and maps batches of series to symbol arrays.
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np
import pandas as pd

from ..kernels.similarity import distance_to_similarity
from .search import subsequence_alignment
from .pool import auto_pool


class SymbolAlignment:
    def __init__(self, codebook: List[np.ndarray], maxcompression: float = 0.5,
                 maxexpansion: float = 2):
        self.codebook = [np.asarray(c, dtype=np.float64) for c in codebook]
        self.maxcompression = maxcompression
        self.maxexpansion = maxexpansion
        self.symbols = None

    def align2(self, series: np.ndarray) -> np.ndarray:
        """Per-timestep argmin over codeword match values
        (alignment.py:57-82); symbol len(codebook) = no match."""
        series = np.asarray(series, dtype=np.float64)
        if series.ndim == 1:
            series = series[None, :]
        n, tlen = series.shape
        k = len(self.codebook)
        patterns = np.full((n, tlen, k + 1), np.inf)
        for sidx in range(n):
            for midx, medoid in enumerate(self.codebook):
                sa = subsequence_alignment(medoid, series[sidx])
                for m in sa.kbest_matches(
                    k=None,
                    minlength=math.floor(len(medoid) * self.maxcompression),
                    maxlength=math.ceil(len(medoid) * self.maxexpansion),
                ):
                    b, e = m["segment"]
                    patterns[sidx, b : e + 1, midx] = m["value"]
        # replicate the reference's sentinel exactly (alignment.py:79-80):
        # the max is taken over the whole array, so if ANY cell is
        # unmatched (inf) the sentinel is inf and all-inf timesteps
        # argmin to codeword 0 — quirky, but parity is parity
        patterns[:, :, k] = 0
        patterns[:, :, k] = np.max(patterns) + 1
        best = np.argmin(patterns, axis=2).astype(int)
        self.symbols = best
        return best

    def align(self, series: np.ndarray, max_rangefactor: float = 2.0,
              max_overlap: Optional[float] = None) -> np.ndarray:
        """Matching-pursuit selection: greedily place the best
        (similarity x length) codeword matches without excessive overlap
        (alignment.py:84-165)."""
        series = np.asarray(series, dtype=np.float64)
        if series.ndim == 1:
            series = series[None, :]
        noword = len(self.codebook)
        best_patterns = np.full(series.shape, noword, dtype=int)
        if max_overlap is None:
            max_overlap = max(self.maxcompression, 1.0 / self.maxexpansion)
        for sidx in range(series.shape[0]):
            cur = series[sidx]
            pats = []
            max_value = 0.0
            for midx, medoid in enumerate(self.codebook):
                sa = subsequence_alignment(medoid, cur)
                for m in sa.best_matches(
                    max_rangefactor=max_rangefactor,
                    minlength=math.floor(len(medoid) * self.maxcompression),
                    maxlength=math.ceil(len(medoid) * self.maxexpansion),
                ):
                    b, e = m["segment"]
                    pats.append((midx, b, e + 1, m["value"]))
                    max_value = max(max_value, m["value"])
            if not pats:
                continue
            D = np.array([p[3] for p in pats])
            L = np.array([p[2] - p[1] + 1 for p in pats], dtype=int)
            B = np.array([p[1] for p in pats], dtype=int)
            E = np.array([p[2] + 1 for p in pats], dtype=int)
            S = distance_to_similarity(D, r=max_value or 1.0, method="exponential") * L
            while True:
                bi = int(np.argmax(S))
                if S[bi] <= 0:
                    break
                midx, b, e, _ = pats[bi]
                free = best_patterns[sidx, b:e] == noword
                best_patterns[sidx, b:e][free] = midx
                overlaps = (
                    np.maximum(0, np.minimum(E[bi], E) - np.maximum(B[bi], B)) / L[bi]
                ) > max_overlap
                S[overlaps] = 0
                S[bi] = 0
        self.symbols = best_patterns
        return best_patterns

    def hangover(self, symbols: np.ndarray, threshold: int = 4):
        """Run-length filter: keep symbols that persist longer than
        threshold, collapse runs (alignment.py:176-199)."""
        sequences = []
        sequences_idx = []
        for r in range(symbols.shape[0]):
            sequence = []
            sequence_idx = []
            lastval = None
            lastcnt = 0
            firstidx = None
            lastsaved = None
            for c, v in enumerate(symbols[r, :]):
                if v != lastval:
                    if lastcnt > threshold and lastval != lastsaved:
                        sequence.append(lastval + 1)  # cannot be zero
                        sequence_idx.append((firstidx, c))
                        lastsaved = lastval
                    lastval = v
                    lastcnt = 0
                    firstidx = c
                else:
                    lastcnt += 1
            sequences.append(sequence)
            sequences_idx.append(sequence_idx)
        return sequences, sequences_idx


class Symbolizer:
    """Actor-pool stage: codebook built once per actor; maps batches of
    (doc_id, tokens) rows to symbol arrays."""

    def __init__(self, codebook: List, threshold: int = 4):
        self.sa = SymbolAlignment([np.asarray(c, dtype=np.float64) for c in codebook])
        self.threshold = threshold

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, toks in zip(batch["doc_id"], batch["tokens"]):
            arr = np.asarray(toks, dtype=np.float64)[None, :]
            sym = self.sa.align2(arr)
            seqs, idxs = self.sa.hangover(sym, threshold=self.threshold)
            rows.append((doc_id, sym[0].tolist(), seqs[0]))
        return pd.DataFrame(rows, columns=["doc_id", "symbols", "symbol_seq"])


def symbolize_tokens(spec, codebook_size: int = 4, n_docs: int = 60):
    """Symbolize token sequences against a codebook of the first
    codebook_size sequences' prefixes (deterministic demo pipeline)."""
    import ray.data as rd

    from ..sources.synth import generate_batch

    t = generate_batch(np.arange(n_docs, dtype=np.int64), spec)
    docs = t.to_pandas()
    codebook = [np.asarray(x, dtype=np.float64)[:12] for x in docs["tokens"][:codebook_size]]
    ds = rd.from_pandas(docs[["doc_id", "tokens"]]).repartition(4)
    return ds.map_batches(
        Symbolizer,
        fn_constructor_kwargs={"codebook": codebook},
        batch_format="pandas",
        concurrency=auto_pool(),
    )
