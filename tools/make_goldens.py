"""Generate golden-oracle parquet for the non-SQL-expressible queries.

For each name in __ray_entry__.GOLDEN_QUERIES the script:
  1. runs the Ray query at sf0.01 TWICE and asserts the canonically
     sorted results are identical (determinism gate);
  2. where an independent implementation exists (the reference library
     at /root/reference/src, a pure-Python recompute, or the engine's
     single-process pandas oracle), recomputes the values and asserts
     they match (provenance gate);
  3. writes the sorted result to goldens/<name>.parquet.

The driver's correctness gate then runs the SQL
``SELECT * FROM read_parquet('goldens/<name>.parquet')`` against the
live Ray run — converting these queries from rows-only checks to full
row-count + schema + value-hash checks.

Run:  python tools/make_goldens.py   (owns its Ray session)
"""

from __future__ import annotations

import hashlib
import os
import re
import sys
import zlib

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE_SRC = "/root/reference/src"
if REFERENCE_SRC not in sys.path:
    sys.path.append(REFERENCE_SRC)

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(REPO, "goldens")

PROVENANCE: dict[str, str] = {}


def canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)


def run_query(qs, name) -> pd.DataFrame:
    r = qs[name](SF_DIR)
    return canon(r.to_pandas() if hasattr(r, "to_pandas") else pd.DataFrame(r))


# ---------------------------------------------------------------------------
# independent recomputations
# ---------------------------------------------------------------------------


def _token_seqs(n):
    import __ray_entry__ as E
    from dtaidistance_ray.sources.synth import generate_batch

    spec = E._token_spec(SF_DIR)
    t = generate_batch(np.arange(n, dtype=np.int64), spec)
    return spec, [np.asarray(x, dtype=np.float64) for x in t["tokens"].to_pylist()]


def check_dtw_distance_matrix(got: pd.DataFrame):
    from dtaidistance import dtw as ref_dtw

    _, seqs = _token_seqs(48)
    m = ref_dtw.distance_matrix(seqs, window=32, use_pruning=True)
    for i, j, d in zip(got["i"], got["j"], got["d"]):
        ref = m[int(i), int(j)]
        assert abs(d - ref) < 5e-6 or (np.isinf(d) and np.isinf(ref)), (i, j, d, ref)  # d rounded to 6
    return "reference dtw.distance_matrix(window=32, use_pruning) over the same 48 sequences"


def check_subsequence_knn(got: pd.DataFrame):
    from dtaidistance import dtw as ref_dtw

    import __ray_entry__ as E
    from dtaidistance_ray.sources.synth import generate_batch, token_table_arrow

    spec = E._token_spec(SF_DIR)
    q = np.asarray(
        generate_batch(np.arange(1, dtype=np.int64), spec)["tokens"].to_pylist()[0],
        dtype=np.float64,
    )
    t = token_table_arrow(spec)
    dists = []
    for doc_id, toks in zip(t["doc_id"].to_pylist(), t["tokens"].to_pylist()):
        s = np.asarray(toks, dtype=np.float64)
        dists.append((ref_dtw.distance(q, s, window=32, use_pruning=True), doc_id))
    dists.sort(key=lambda x: (x[0], x[1]))
    want = {doc: d for d, doc in dists[: len(got)]}
    for doc, d in zip(got["doc_id"], got["d"]):
        assert doc in want and abs(want[doc] - d) < 5e-6, (doc, d, want.get(doc))  # d rounded to 6
    return "brute-force reference dtw.distance top-k over the full corpus"


def check_hierarchical(got: pd.DataFrame):
    from dtaidistance import dtw as ref_dtw
    from dtaidistance.clustering import hierarchical as ref_hier

    _, seqs = _token_seqs(24)
    model = ref_hier.Hierarchical(
        ref_dtw.distance_matrix, {"window": 16}, max_dist=80.0
    )
    clusters = model.fit(seqs)
    want = sorted(
        (int(m), int(p)) for p, members in clusters.items() for m in members
    )
    ours = sorted(zip(got["series_idx"].astype(int), got["prototype_idx"].astype(int)))
    assert want == ours, (want[:5], ours[:5])
    return "reference clustering.Hierarchical on the same 24 sequences"


def check_nw_align(got: pd.DataFrame):
    from dtaidistance import alignment as ref_align

    _, seqs = _token_seqs(20)
    seqs = [list(np.asarray(s) % 16) for s in seqs]
    for i, j, v in zip(got["i"], got["j"], got["nw_score"]):
        ref_v = ref_align.needleman_wunsch(seqs[int(i)], seqs[int(j)])[0]
        assert abs(float(ref_v) - v) < 1e-9, (i, j, v, ref_v)
    return "reference alignment.needleman_wunsch per pair"


def check_subsequence_alignment(got: pd.DataFrame):
    from dtaidistance import subsequence as ref_sub

    import __ray_entry__ as E
    from dtaidistance_ray.sources.synth import generate_batch

    spec = E._token_spec(SF_DIR)
    t = generate_batch(np.arange(12, dtype=np.int64), spec)
    want = []
    for doc_id, toks in zip(t["doc_id"].to_pylist(), t["tokens"].to_pylist()):
        s = np.asarray(toks, dtype=np.float64)
        if len(s) < 24:
            continue
        sa = ref_sub.subsequence_alignment(s[5:15], s, penalty=0.1)
        for m in sa.kbest_matches(k=2):
            seg = m.segment
            want.append((doc_id, int(seg[0]), int(seg[1]), round(float(m.value), 6)))
    ours = sorted(zip(got["doc_id"], got["start"], got["end"], got["value"]))
    assert sorted(want) == [(a, int(b), int(c), float(d)) for a, b, c, d in ours], (
        sorted(want)[:3],
        ours[:3],
    )
    return "reference subsequence.subsequence_alignment kbest_matches per document"


def _norm_text(t: str) -> str:
    return " ".join(t.lower().split())


def _string_shingles(t: str, k: int = 5) -> set:
    t = _norm_text(t)
    if not t:
        return set()
    if len(t) < k:
        return {t}
    return {t[i : i + k] for i in range(len(t) - k + 1)}


def _read_docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])


def check_ngram_jaccard(got: pd.DataFrame):
    docs = _read_docs()
    texts = dict(zip(docs["doc_id"].astype(int), docs["text"]))
    sh = {}
    for a, b, j in zip(got["doc_a"], got["doc_b"], got["jaccard"]):
        for d in (int(a), int(b)):
            if d not in sh:
                sh[d] = _string_shingles(texts[d])
        inter = len(sh[int(a)] & sh[int(b)])
        union = len(sh[int(a)] | sh[int(b)])
        want = round(inter / union, 6) if union else 0.0
        assert abs(want - j) < 1e-9, (a, b, j, want)
    return "pure-Python STRING-shingle Jaccard per pair (independent of the hashed-shingle path)"


def check_minhash_dedup_pairs(got: pd.DataFrame):
    # soundness: every reported pair really meets the threshold on
    # string shingles; completeness: brute-force all pairs, every true
    # pair above threshold is reported (LSH recall check)
    docs = _read_docs()
    ids = docs["doc_id"].astype(int).to_numpy()
    sh = [_string_shingles(t) for t in docs["text"]]
    true_pairs = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(sh[i] & sh[j])
            if not inter:
                continue
            union = len(sh[i]) + len(sh[j]) - inter
            jac = round(inter / union, 6)
            if jac >= 0.6:
                a, b = sorted((int(ids[i]), int(ids[j])))
                true_pairs[(a, b)] = jac
    ours = {
        (int(a), int(b)): float(j)
        for a, b, j in zip(got["doc_a"], got["doc_b"], got["jaccard"])
    }
    assert set(ours) == set(true_pairs), (
        set(ours) ^ set(true_pairs)
    )
    for k, v in ours.items():
        assert abs(v - true_pairs[k]) < 1e-9, (k, v, true_pairs[k])
    return "brute-force all-pairs string-shingle Jaccard >= 0.6 (soundness AND recall)"


def check_doc_fingerprints(got: pd.DataFrame):
    docs = _read_docs()
    MOD = (1 << 61) - 1
    want = {}
    for d, t in zip(docs["doc_id"].astype(int), docs["text"]):
        h = 0
        for byte in t.encode():  # per-byte Horner — independent of from_bytes
            h = (h * 256 + byte) % MOD
        want[int(d)] = (h, zlib.crc32(t.encode()))
    for d, fp, crc in zip(got["doc_id"], got["fingerprint"], got["crc32"]):
        assert want[int(d)] == (int(fp), int(crc)), d
    return "per-byte Horner recompute (base 256 mod 2^61-1) + crc32"


def check_simhash(got: pd.DataFrame):
    word_re = re.compile(r"\w+")
    docs = _read_docs()
    want = {}
    for d, t in zip(docs["doc_id"].astype(int), docs["text"]):
        acc = [0] * 64
        for w in word_re.findall(t.lower()):
            h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
            for bit in range(64):
                acc[bit] += 1 if (h >> bit) & 1 else -1
        v = 0
        for bit in range(64):
            if acc[bit] > 0:
                v |= 1 << bit
        want[int(d)] = v - (1 << 64) if v >= (1 << 63) else v
    for d, s in zip(got["doc_id"], got["simhash"]):
        assert want[int(d)] == int(s), (d, s, want[int(d)])
    return "per-word scalar recompute of the 64-bit hash-weighted majority"


def check_minhash_signatures(got: pd.DataFrame):
    from dtaidistance_ray.stages.dedup import shingle_hash_array

    docs = _read_docs()
    rng = np.random.default_rng(1234)
    a = rng.integers(1, 2**63, size=64, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 2**63, size=64, dtype=np.uint64)
    want = {}
    for d, t in zip(docs["doc_id"].astype(int), docs["text"]):
        h = shingle_hash_array(t)
        sig = []
        for p in range(64):  # scalar per-permutation loop (independent of the matrix path)
            best = None
            for x in h:
                v = int((int(x) * int(a[p]) + int(b[p])) % (1 << 64))
                best = v if best is None or v < best else best
            sig.append(np.uint64(best if best is not None else 0).astype(np.int64))
        want[int(d)] = [int(np.int64(np.uint64(s))) for s in sig]
    for d in want:
        sub = got[got["doc_id"] == d].sort_values("perm")
        assert list(sub["sig"].astype(np.int64)) == want[d], d
    return "scalar per-permutation multiply-shift recompute over the same shingle hashes"


def check_embedding_near_dup(got: pd.DataFrame):
    """Independent recompute of the banded-LSH spec (4 bands x 4 bits,
    cap-512 median-split refinement) straight from the raw parquet."""
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    m = np.stack([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    ids = emb["vec_id"].astype(int).to_numpy()
    bands, bpb, cap, thr = 4, 4, 512, 0.35
    rng = np.random.default_rng(99)
    planes = rng.normal(size=(m.shape[1], bands * bpb))
    refine = np.random.default_rng(101).normal(size=(m.shape[1], 32))
    bits = ((m @ planes) > 0).reshape(len(m), bands, bpb)
    sig = (bits * (1 << np.arange(bpb))).sum(axis=2)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mn = m / norms
    want = set()

    def rec(sel, level):
        # sel is in id-sorted order (established at the bucket root)
        if len(sel) <= cap:
            if len(sel) < 2:
                return
            sims = np.round(mn[sel] @ mn[sel].T, 6)
            for x in range(len(sel)):
                for y in range(x + 1, len(sel)):
                    if sims[x, y] >= thr:
                        want.add((int(ids[sel[x]]), int(ids[sel[y]]), float(sims[x, y])))
            return
        proj = mn[sel] @ refine[:, level % 32]
        med = np.median(proj)
        left = proj <= med
        if left.all() or not left.any():
            half = len(sel) // 2
            rec(sel[:half], level + 1)
            rec(sel[half:], level + 1)
            return
        rec(sel[left], level + 1)
        rec(sel[~left], level + 1)

    for b in range(bands):
        for bucket in np.unique(sig[:, b]):
            sel = np.flatnonzero(sig[:, b] == bucket)
            rec(sel[np.argsort(ids[sel])], 0)
    ours = {
        (int(a), int(b), float(s))
        for a, b, s in zip(got["vec_a"], got["vec_b"], got["cos_sim"])
    }
    assert want == ours, (len(want), len(ours))
    return "driver-side numpy recompute of the banded LSH + capped in-bucket cosine from the raw parquet"


def check_tier0_repr(got: pd.DataFrame):
    import __ray_entry__ as E
    from dtaidistance_ray.pipelines.flagship import rollup_oracle
    from dtaidistance_ray.stages.rollup import RollupConfig

    spec = E._token_spec(SF_DIR)
    t0 = rollup_oracle(spec, RollupConfig())[0]
    t0 = t0[~t0["gap_filled"]]
    want = []
    for src, bkt, rep in zip(t0["source"], t0["bucket"], t0["repr_series"]):
        rep = np.asarray(rep, dtype=np.float64)
        for pos, v in enumerate(np.round(rep, 6)):
            want.append((src, int(bkt), pos, float(v)))
    ours = list(
        zip(got["source"], got["bucket"].astype(int), got["pos"].astype(int), got["val"])
    )
    assert sorted(want) == sorted(ours), (len(want), len(ours))
    return "single-process pandas rollup_oracle (independent of the distributed scan path)"


def check_warping_path_lowmem(got: pd.DataFrame):
    from dtaidistance import dtw as ref_dtw

    _, seqs = _token_seqs(12)
    for p in range(6):
        sub = got[got["pair"] == p].sort_values("step")
        path = list(zip(sub["i"].astype(int), sub["j"].astype(int)))
        s1, s2 = seqs[2 * p], seqs[2 * p + 1]
        # validity: starts/ends at corners, monotone unit steps
        assert path[0] == (0, 0) and path[-1] == (len(s1) - 1, len(s2) - 1)
        for (a, b), (c, d) in zip(path, path[1:]):
            assert (c - a, d - b) in {(0, 1), (1, 0), (1, 1)}
        # optimality: path cost equals the reference DTW distance
        cost = np.sqrt(sum((s1[i] - s2[j]) ** 2 for i, j in path))
        assert abs(cost - ref_dtw.distance(s1, s2)) < 1e-9, p
    return "path validity + cost == reference dtw.distance (optimality proof per pair)"


def check_warping_path_prob(got: pd.DataFrame):
    from dtaidistance import dtw as ref_dtw

    _, seqs = _token_seqs(12)
    max_distinct = 0
    for p in range(6):
        s1, s2 = seqs[2 * p], seqs[2 * p + 1]
        d_ref = ref_dtw.distance(s1, s2)
        sub_p = got[got["pair"] == p]
        paths = set()
        for s in sorted(sub_p["sample"].unique()):
            sub = sub_p[sub_p["sample"] == s].sort_values("step")
            path = list(zip(sub["i"].astype(int), sub["j"].astype(int)))
            # validity: corner endpoints (psi=0), monotone unit steps
            assert path[0] == (0, 0) and path[-1] == (len(s1) - 1, len(s2) - 1)
            for (a, b), (c, d) in zip(path, path[1:]):
                assert (c - a, d - b) in {(0, 1), (1, 0), (1, 1)}
            # a sampled path's cost is lower-bounded by the optimum
            cost = np.sqrt(sum((s1[i] - s2[j]) ** 2 for i, j in path))
            assert cost >= d_ref - 1e-9, (p, s)
            paths.add(tuple(path))
        max_distinct = max(max_distinct, len(paths))
    # the sampler must actually explore: some pair yields >= 2 distinct paths
    assert max_distinct >= 2
    n_samples = got.groupby("pair")[["sample"]].nunique()["sample"].sum()
    assert n_samples == 30  # 6 pairs x 5 samples all present
    return (
        "path validity + corner endpoints per sample; sampled cost >= reference "
        "dtw.distance (optimal lower bound); >=2 distinct paths sampled; all "
        "30 seeded samples present"
    )


def check_dtw_weighted_matrix(got: pd.DataFrame):
    from dtaidistance import dtw_weighted as ref_w

    _, seqs = _token_seqs(8)
    seqs = [s[:24] % 64 for s in seqs]
    w = np.full((len(seqs[0]), 8), np.inf)
    w[:, 2:6] = 0.0
    w[4:12, 2:6] = 8.0
    m = ref_w.distance_matrix(seqs, {0: w}, window=8)
    for i, j, d in zip(got["i"], got["j"], got["d"]):
        assert abs(m[int(i), int(j)] - d) < 5e-6, (i, j, d, m[int(i), int(j)])
    return "reference dtw_weighted.distance_matrix with the same weight profile"


def check_explain_pairs(got: pd.DataFrame):
    from dtaidistance.explain.dsw.explainpair import ExplainPair as RefEP

    _, seqs = _token_seqs(12)
    for p in range(6):
        r = RefEP(seqs[2 * p], seqs[2 * p + 1], delta_rel=1, delta_abs=2.0)
        want = [
            (int(s.s_idx), int(s.e_idx), int(s.s_idx_y), int(s.e_idx_y),
             int(s.shift), int(s.elasticity))
            for s in r.segments
        ]
        sub = got[got["pair_id"] == p].sort_values(["s_idx", "s_idx_y"])
        ours = list(
            zip(
                sub["s_idx"].astype(int), sub["e_idx"].astype(int),
                sub["s_idx_y"].astype(int), sub["e_idx_y"].astype(int),
                sub["shift"].astype(int), sub["elasticity"].astype(int),
            )
        )
        assert sorted(want) == sorted(ours), (p, want[:3], ours[:3])
    return "reference explain.dsw ExplainPair segments per pair"


def check_multimodal_decode_real(got: pd.DataFrame):
    # independent recompute: decode payloads directly and pool
    from dtaidistance_ray.codec.jpeg import decode_jpeg
    from dtaidistance_ray.stages.multimodal import (
        decode_bmp, decode_png, decode_ppm, synth_media_table_real,
    )

    t = synth_media_table_real(90, seed=11).to_pandas().set_index("media_id")
    decoders = {"bmp": decode_bmp, "ppm": decode_ppm, "png": decode_png, "jpeg": decode_jpeg}
    seen_codecs = set()
    for mid, crc, pm in zip(got["media_id"], got["thumb_crc"], got["pixel_mean"]):
        row = t.loc[mid]
        seen_codecs.add(row["codec"])
        px = decoders[row["codec"]](bytes(row["payload"]))
        assert abs(float(px.mean()) - pm) < 1e-5, mid
    assert seen_codecs == {"bmp", "ppm", "png", "jpeg"}, seen_codecs
    return "direct pure-NumPy BMP/PPM/PNG/JPEG decode of the same payloads (pixel_mean equality)"


def check_multimodal_audio(got: pd.DataFrame):
    from dtaidistance_ray.stages.multimodal import decode_wav, synth_media_table_real

    t = synth_media_table_real(90, seed=11).to_pandas().set_index("media_id")
    for mid, rms, zcr, dom in zip(got["media_id"], got["rms"], got["zcr"], got["dominant_hz"]):
        samples, rate = decode_wav(bytes(t.loc[mid]["payload"]))
        x = samples.astype(np.float64) / 32768.0
        assert abs(np.sqrt(np.mean(x * x)) - rms) < 1e-5, mid
        spec = np.abs(np.fft.rfft(x))
        want = float(np.fft.rfftfreq(len(x), 1.0 / rate)[int(np.argmax(spec[1:])) + 1])
        assert abs(want - dom) < 0.05, (mid, dom, want)
    return "direct WAV decode + numpy recompute of rms / dominant frequency"


def check_multimodal_decode_gif(got: pd.DataFrame):
    """Independent recompute: regenerate the SOURCE palette/index
    arrays from the corpus seed (the encoder's inputs, no decoder
    involved) and compare pixel means — a decode_gif bug cannot
    self-verify through this check."""
    rng = np.random.default_rng(17)
    want = {}
    for i in range(60):
        h = int(rng.integers(4, 48))
        w = int(rng.integers(4, 48))
        ncol = int(rng.integers(2, 257))
        pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
        if i % 3 == 0:
            idx = (np.add.outer(np.arange(h), np.arange(w)) % ncol).astype(np.uint8)
        else:
            idx = rng.integers(0, ncol, size=(h, w), dtype=np.uint8)
        want[f"g{i:08d}"] = float(pal[idx].mean())
    assert len(got) == 60
    for mid, pm in zip(got["media_id"], got["pixel_mean"]):
        assert abs(want[mid] - pm) < 1e-5, mid
    return (
        "pixel-mean equality with the pre-encode source arrays regenerated from the "
        "corpus seed (decoder-independent); spec-level byte fixture in tests/test_stages.py"
    )


def check_profile_dtw_anomaly(got: pd.DataFrame):
    """Reference recompute: the gap-filled hourly grid is re-derived
    by DuckDB (the engine's gapfill SQL oracle), then the reference
    dtaidistance library runs the whole scoring chain —
    dtw_barycenter.dba_loop for the per-type barycenter and
    dtw.distance(window=4) for the day scores."""
    import duckdb

    from dtaidistance import dtw as ref_dtw
    from dtaidistance import dtw_barycenter as ref_dba

    from dtaidistance_ray.stages.events import ROLLUP_GAPFILL_SQL

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    grid = con.execute(ROLLUP_GAPFILL_SQL).df()
    want_rows = []
    for et, g in grid.groupby("event_type", sort=True):
        g = g.sort_values("bucket", kind="mergesort")
        profs, days = [], []
        for d, gd in g.groupby(g["bucket"].dt.floor("D"), sort=True):
            if len(gd) != 24:
                continue
            x = gd["n_events"].to_numpy(np.float64)
            if x.std() == 0:
                continue
            profs.append((x - x.mean()) / x.std())
            days.append(d)
        if not profs:
            continue
        center = ref_dba.dba_loop(profs, c=profs[0], max_it=10, thr=0.001, window=4)
        dists = np.array([ref_dtw.distance(p, center, window=4) for p in profs])
        order = np.lexsort((np.arange(len(dists)), -dists))[:5]
        for rnk, i in enumerate(order, 1):
            want_rows.append((et, days[i], rnk, dists[i]))
    assert len(want_rows) == len(got), (len(want_rows), len(got))
    got_s = got.sort_values(["event_type", "rnk"]).reset_index(drop=True)
    want_rows.sort(key=lambda r: (r[0], r[2]))
    for (et, day, rnk, d), (_, row) in zip(want_rows, got_s.iterrows()):
        assert row["event_type"] == et and int(row["rnk"]) == rnk
        assert pd.Timestamp(row["day"]) == pd.Timestamp(day), (et, rnk)
        assert abs(row["dist"] - d) < 5e-6, (et, rnk, row["dist"], d)
    return (
        "reference dtaidistance dba_loop + dtw.distance(window=4) over a "
        "DuckDB-derived gap-filled grid (full chain recompute)"
    )


def check_multimodal_gif_frames(got: pd.DataFrame):
    """Independent recompute: regenerate the SOURCE frame arrays and
    delays from the corpus seed, replay the tick->frame mapping and
    digest pal[idx] directly — no GIF decoding involved."""
    import hashlib

    rng = np.random.default_rng(19)
    want = {}
    for i in range(40):
        h = int(rng.integers(6, 24))
        w = int(rng.integers(6, 24))
        nframes = int(rng.integers(2, 9))
        ncol = int(rng.integers(2, 65))
        pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
        frames = [rng.integers(0, ncol, size=(h, w), dtype=np.uint8) for _ in range(nframes)]
        delays = (rng.integers(5, 40, size=nframes) * 10).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(delays)[:-1]])
        total = int(delays.sum())
        for t in range(0, max(total, 1), 200):
            fi = int(np.searchsorted(starts, t, side="right")) - 1
            dig = hashlib.blake2b(pal[frames[fi]].tobytes(), digest_size=8).hexdigest()
            want[(f"v{i:08d}", t)] = dig
    assert len(got) == len(want), (len(got), len(want))
    for mid, t, dig in zip(got["media_id"], got["frame_ms"], got["frame_digest"]):
        assert want[(mid, int(t))] == dig, (mid, t)
    return (
        "frame digests recomputed from the pre-encode source frames + delays "
        "regenerated from the corpus seed (decoder-independent tick replay)"
    )


def check_multimodal_video_mjpeg(got: pd.DataFrame):
    """Three independent gates, none touching codec/avi.py or
    codec/jpeg.py decode:
    1. tick replay — frame_idx/frame_ms recomputed from the (rate,
       scale) regenerated from the corpus seed (integer arithmetic);
    2. container walk — the selected frame's raw JPEG bytes digested
       by a local minimal RIFF walker written here (layout from the
       public AVI spec), never the repo's parser;
    3. real decode — frame_mean/frame_std must sit within JPEG-loss
       tolerance of the PRE-ENCODE source frame statistics (source
       frame means span ~45..215 by construction, so a fake decode
       with mean ~127.5 fails)."""
    import hashlib
    import struct

    from dtaidistance_ray.stages.multimodal import _mjpeg_source_frames, synth_video_table_mjpeg

    def riff_video_chunks(avi: bytes) -> list[bytes]:
        # minimal independent walker: find LIST movi, take NNdc chunks
        assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
        out = []

        def walk(pos, end):
            while pos + 8 <= end:
                cid = avi[pos : pos + 4]
                size = struct.unpack_from("<I", avi, pos + 4)[0]
                if cid == b"LIST" and avi[pos + 8 : pos + 12] in (b"movi", b"rec "):
                    walk(pos + 12, pos + 8 + size)
                elif cid[2:4] == b"dc":
                    out.append(avi[pos + 8 : pos + 8 + size])
                pos += 8 + size + (size & 1)

        walk(12, len(avi))
        return out

    payloads = synth_video_table_mjpeg(36, seed=23).to_pandas().set_index("media_id")["payload"]
    rng = np.random.default_rng(23)
    want = {}
    for i in range(36):
        frames, rate, scale = _mjpeg_source_frames(rng)
        mid = f"j{i:08d}"
        chunks = riff_video_chunks(bytes(payloads.loc[mid]))
        assert len(chunks) == len(frames), mid
        dur = int(round(len(frames) * 1000 * scale / rate))
        for t in range(0, max(dur, 1), 100):
            fi = min(t * rate // (scale * 1000), len(frames) - 1)
            src = frames[fi].astype(np.float64)
            want[(mid, t)] = (
                fi,
                hashlib.blake2b(chunks[fi], digest_size=8).hexdigest(),
                float(src.mean()),
                float(src.std()),
            )
    assert len(got) == len(want), (len(got), len(want))
    for mid, t, fi, dig, mean, std in zip(
        got["media_id"], got["frame_ms"], got["frame_idx"], got["chunk_digest"],
        got["frame_mean"], got["frame_std"],
    ):
        wfi, wdig, wmean, wstd = want[(mid, int(t))]
        assert int(fi) == wfi, (mid, t, fi, wfi)
        assert dig == wdig, (mid, t)
        assert abs(mean - wmean) < 1.0, (mid, t, mean, wmean)
        assert abs(std - wstd) < 2.0, (mid, t, std, wstd)
    return (
        "tick replay + raw-chunk digests via an independent minimal RIFF walker "
        "+ decoded-frame mean/std within JPEG-loss tolerance of the pre-encode "
        "source frames regenerated from the corpus seed (decoder-independent)"
    )


def check_multimodal_audio_g711(got: pd.DataFrame):
    """Independent decode: CPython's audioop (a separate C
    implementation of G.711 and IMA ADPCM) undoes the companding —
    never our own codecs — then numpy recomputes the features."""
    import struct

    try:
        import audioop  # stdlib through 3.12; removed in Python 3.13 (PEP 594)
    except ImportError as exc:  # pragma: no cover - depends on interpreter
        raise RuntimeError(
            "golden regeneration for multimodal_audio_g711 needs the stdlib "
            "audioop oracle (Python <= 3.12); regenerate on an older interpreter"
        ) from exc

    from dtaidistance_ray.codec import ima_adpcm as ima
    from dtaidistance_ray.stages.multimodal import synth_audio_table_g711

    def _riff_chunks(wav: bytes) -> dict:
        """Walk RIFF chunk headers (offsets can't collide with payload
        bytes, unlike a rindex over the whole file)."""
        chunks, pos = {}, 12
        while pos + 8 <= len(wav):
            cid = wav[pos : pos + 4]
            size = struct.unpack_from("<I", wav, pos + 4)[0]
            chunks[cid] = wav[pos + 8 : pos + 8 + size]
            pos += 8 + size + (size & 1)  # word-aligned: odd chunks carry a pad byte
        return chunks

    t = synth_audio_table_g711(90, seed=13).to_pandas().set_index("media_id")
    assert len(got) == 90
    for mid, rms, zcr, dom in zip(got["media_id"], got["rms"], got["zcr"], got["dominant_hz"]):
        row = t.loc[mid]
        wav = bytes(row["payload"])
        codec = row["codec"]
        chunks = _riff_chunks(wav)
        data = chunks[b"data"]
        n = struct.unpack_from("<I", chunks[b"fact"], 0)[0]
        if codec in ("ulaw", "alaw"):
            fn = audioop.ulaw2lin if codec == "ulaw" else audioop.alaw2lin
            samples = np.frombuffer(fn(data, 2), dtype="<i2")[:n]
        else:  # adpcm: repack each block's nibbles high-first for audioop
            out, pos = [], 0
            spb = (256 - 4) * 2 + 1
            while pos + 4 <= len(data) and len(out) < n:
                first = struct.unpack_from("<h", data, pos)[0]
                index = data[pos + 2]
                nib = ima._unpack_low_first(data[pos + 4 : pos + 256])
                n_body = min(n - len(out) - 1, spb - 1)
                hf = ima._pack(nib, high_first=True)
                ref, _ = audioop.adpcm2lin(hf[: (n_body + 1) // 2], 2, (first, index))
                out.extend([first] + np.frombuffer(ref, dtype="<i2")[:n_body].tolist())
                pos += 256
            samples = np.array(out, dtype=np.int16)
        x = samples.astype(np.float64) / 32768.0
        assert abs(np.sqrt(np.mean(x * x)) - rms) < 1e-5, mid
        want_zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
        assert abs(want_zcr - zcr) < 1e-5, mid
        spec = np.abs(np.fft.rfft(x))
        want = float(np.fft.rfftfreq(len(x), 1.0 / 8000)[int(np.argmax(spec[1:])) + 1])
        assert abs(want - dom) < 0.05, (mid, dom, want)
    return (
        "audioop (CPython's independent G.711/IMA-ADPCM C implementation) decode of "
        "the companded payloads + numpy recompute of rms/zcr/dominant frequency"
    )


def check_multimodal_audio_flac(got: pd.DataFrame):
    """Decoder-INDEPENDENT verification: regenerate the pre-encode
    source waves (synth_flac_wave is deterministic in the rng walk)
    and recompute the features directly from them — the FLAC decoder
    never runs here. Lossless codec => the engine's decoded features
    must match these source-side features to the same rounding."""
    from dtaidistance_ray.stages.multimodal import synth_flac_wave

    rng = np.random.default_rng(17)
    waves = {}
    for i in range(90):
        wave, rate, _mode, _po, _stereo = synth_flac_wave(rng, i)
        waves[f"f{i:08d}"] = (wave, rate)
    assert len(got) == 90
    for mid, rms, zcr, dom in zip(got["media_id"], got["rms"], got["zcr"], got["dominant_hz"]):
        wave, rate = waves[mid]
        x = wave.astype(np.float64)
        if x.ndim == 2:
            x = x.mean(axis=1)  # the stage's stereo downmix
        x = x / 32768.0
        assert round(float(np.sqrt(np.mean(x * x))), 6) == rms, mid
        want_zcr = round(float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))), 6)
        assert want_zcr == zcr, mid
        spec = np.abs(np.fft.rfft(x))
        want = round(float(np.fft.rfftfreq(len(x), 1.0 / rate)[int(np.argmax(spec[1:])) + 1]), 2)
        assert want == dom, (mid, dom, want)
    return (
        "feature recompute from the PRE-ENCODE source samples (FLAC decoder never "
        "runs; lossless codec => exact equality at the stage's own rounding)"
    )


def check_ann_ivf_topk(got: pd.DataFrame):
    # independent recompute: same deterministic centroids (train sample
    # = first train_size rows by storage order), probing, and scoring
    from dtaidistance_ray.stages.ann import _kmeans_centroids

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    m = np.stack([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    ids = emb["vec_id"].astype(int).to_numpy()
    cent = _kmeans_centroids(m[:2048], 16)
    q = m[int(np.argmin(ids))]
    qn = q / np.linalg.norm(q)
    probe = set(np.argsort(-(cent @ qn))[:4].tolist())
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mn = m / norms
    assign = np.argmax(mn @ cent.T, axis=1)
    keep = np.array([a in probe for a in assign])
    sims = np.round(mn[keep] @ qn, 6)
    kid = ids[keep]
    order = np.lexsort((kid, -sims))[:10]
    want = list(zip(kid[order], sims[order]))
    ours = list(zip(got["vec_id"].astype(int), got["cos_sim"]))
    # compare as sorted sets (driver sorts rows canonically anyway)
    assert sorted(want) == sorted((int(a), float(b)) for a, b in ours), (want, ours)
    return "driver-side numpy recompute of the IVF probe + scoring from raw parquet"


def check_payload_crc(got: pd.DataFrame):
    import zlib

    import __ray_entry__ as E
    from dtaidistance_ray.pipelines.flagship import rollup_oracle
    from dtaidistance_ray.stages.rollup import RollupConfig, encode_frame

    spec = E._token_spec(SF_DIR)
    tiers = rollup_oracle(spec, RollupConfig())
    want = {}
    for t, frame in tiers.items():
        enc = encode_frame(frame)
        for src, bkt, payload in zip(enc["source"], enc["bucket"], enc["repr_gorilla"]):
            want[(int(t), src, int(bkt))] = zlib.crc32(bytes(payload))
    ours = {
        (int(t), s, int(b)): int(c)
        for t, s, b, c in zip(got["tier"], got["source"], got["bucket"], got["payload_crc"])
    }
    assert want == ours, (len(want), len(ours))
    return "single-process rollup_oracle rows encoded with the same codec (crc equality per (tier, source, bucket))"


def _check_tier_full(tier: int):
    def check(got: pd.DataFrame):
        import __ray_entry__ as E
        from dtaidistance_ray.pipelines.flagship import rollup_oracle
        from dtaidistance_ray.stages.rollup import RollupConfig, encode_frame

        spec = E._token_spec(SF_DIR)
        tiers = rollup_oracle(spec, RollupConfig())
        enc = encode_frame(tiers[tier])
        want = canon(E._tier_full_view(tier)(enc))
        pd.testing.assert_frame_equal(canon(got.reset_index(drop=True)), want)
        return (
            "single-process rollup_oracle tier rows, encoded with the same "
            "codec and flattened with the same view (full frame equality "
            "incl. payload crc per (source, bucket))"
        )

    return check


check_tier0_full = _check_tier_full(0)
check_tier2_full = _check_tier_full(2)


def check_subsequence_knee(got: pd.DataFrame):
    """Reference-library recompute: the reference's own
    best_matches_knee iterator over the same (query, series) pairs."""
    import numpy as np

    from dtaidistance.subsequence.subsequencealignment import subsequence_alignment

    import __ray_entry__ as E
    from dtaidistance_ray.sources.synth import generate_batch

    spec = E._token_spec(SF_DIR)
    t = generate_batch(np.arange(12, dtype=np.int64), spec).to_pandas()
    want = []
    for doc_id, toks in zip(t["doc_id"], t["tokens"]):
        toks = np.asarray(toks, dtype=np.float64)
        if len(toks) < 24:
            continue
        query = toks[5:15]
        sa = subsequence_alignment(query, toks)
        for rank, m in enumerate(sa.best_matches_knee(alpha=0.3)):
            want.append(
                (doc_id, rank, int(m.idx), int(m.segment[0]), int(m.segment[1]),
                 round(float(m.value), 6))
            )
    ours = [
        (d, int(r), int(i), int(s), int(e), float(v))
        for d, r, i, s, e, v in zip(
            got["doc_id"], got["rank"], got["idx"], got["start"], got["end"], got["value"]
        )
    ]
    assert sorted(want) == sorted(ours), (len(want), len(ours))
    return "reference library best_matches_knee over the same pairs (exact match-stream equality)"


def check_time_index(got: pd.DataFrame):
    """Independent recompute: dod_encode over the gap-filled tier grids
    of the single-process rollup_oracle."""
    import zlib

    import numpy as np

    import __ray_entry__ as E
    from dtaidistance_ray.codec import dod_encode
    from dtaidistance_ray.pipelines.flagship import rollup_oracle
    from dtaidistance_ray.stages.rollup import RollupConfig

    cfg = RollupConfig()
    tiers = rollup_oracle(E._token_spec(SF_DIR), cfg)
    want = {}
    for t, frame in tiers.items():
        width = cfg.tier_widths[t]
        for src, g in frame.groupby("source"):
            ts = np.sort(g["bucket"].unique()) * width
            want[(int(t), src)] = (len(ts), zlib.crc32(bytes(dod_encode(ts))))
    ours = {
        (int(t), s): (int(n), int(c))
        for t, s, n, c in zip(got["tier"], got["source"], got["n_buckets"], got["ts_dod_crc"])
    }
    assert want == ours, (len(want), len(ours))
    return "single-process rollup_oracle grids re-encoded with the same dod codec (crc + count equality)"


def check_embedding_pca(got: pd.DataFrame):
    """Independent recompute: direct SVD of the centered in-memory
    corpus (no distributed covariance, different LAPACK route) must
    reproduce every loading and explained variance within 2e-6."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
    m = np.stack([np.asarray(v, np.float64) for v in t.column("embedding").to_pylist()])
    x = m - m.mean(axis=0)
    _, sv, vt = np.linalg.svd(x, full_matrices=False)
    var = sv**2 / len(m)
    for comp, g in got.groupby("component"):
        g = g.sort_values("pos")
        vec = vt[comp - 1]
        j = np.argmax(np.abs(np.round(vec, 12)))
        if vec[j] < 0:
            vec = -vec
        assert np.allclose(g["loading"].to_numpy(), vec, atol=2e-6), comp
        assert abs(g["variance"].iloc[0] - var[comp - 1]) < 2e-6, comp
    return "direct SVD of the centered corpus (independent of the distributed Gram-matrix path) within 2e-6"


def check_ann_pq_topk(got: pd.DataFrame):
    # independent recompute of train/encode/ADC from raw parquet with
    # the same deterministic seed and the same float expressions
    from dtaidistance_ray.stages.ann import _pq_train

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    m = np.stack([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    ids = emb["vec_id"].astype(int).to_numpy()
    bounds, books = _pq_train(m[:2048])
    q = m[int(np.argmin(ids))]
    q = q / np.linalg.norm(q)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mn = m / norms
    dist = np.zeros(len(mn))
    for j, C in enumerate(books):
        X = mn[:, bounds[j] : bounds[j + 1]]
        codes = np.argmin(((X[:, None, :] - C[None, :, :]) ** 2).sum(-1), axis=1)
        table = ((q[bounds[j] : bounds[j + 1]][None, :] - C) ** 2).sum(-1)
        dist += table[codes]
    dist = np.round(dist, 6)
    order = np.lexsort((ids, dist))[:10]
    want = sorted(zip(ids[order].tolist(), dist[order].tolist()))
    ours = sorted(zip(got["vec_id"].astype(int), got["approx_dist"].astype(float)))
    assert want == [(int(a), float(b)) for a, b in ours], (want, ours)
    return "driver-side numpy recompute of PQ train/encode/ADC from raw parquet"


def check_repr_drift(got: pd.DataFrame):
    from dtaidistance import dtw as ref_dtw

    import __ray_entry__ as E
    from dtaidistance_ray.pipelines.flagship import rollup_oracle
    from dtaidistance_ray.stages.rollup import RollupConfig

    spec = E._token_spec(SF_DIR)
    t2 = rollup_oracle(spec, RollupConfig())[2]
    t2 = t2[~t2["gap_filled"]]
    want = {}
    for src_name, g in t2.groupby("source"):
        g = g.sort_values("bucket")
        reps = [np.asarray(r, dtype=np.float64) for r in g["repr_series"]]
        bks = g["bucket"].astype(int).tolist()
        for k in range(1, len(bks)):
            want[(src_name, bks[k])] = ref_dtw.distance(
                reps[k - 1], reps[k], window=32, use_pruning=True
            )
    assert len(want) == len(got)
    for src_name, bkt, d in zip(got["source"], got["bucket"].astype(int), got["d"]):
        ref = want[(src_name, bkt)]
        assert abs(d - ref) < 5e-6 or (np.isinf(d) and np.isinf(ref)), (src_name, bkt, d, ref)
    return (
        "reference dtw.distance(window=32, use_pruning) over the single-process "
        "rollup_oracle's tier-2 representatives"
    )


def check_repr_fidelity(got: pd.DataFrame):
    """Reference recompute: dtw.distance(member, oracle repr, window=16)
    for every member of the sampled groups, with members re-derived
    driver-side from the deterministic generator."""
    from dtaidistance import dtw as ref_dtw

    import __ray_entry__ as E
    from dtaidistance_ray.pipelines.flagship import rollup_oracle
    from dtaidistance_ray.sources.synth import derive_ts, token_table_arrow
    from dtaidistance_ray.stages.rollup import RollupConfig

    spec = E._token_spec(SF_DIR)
    cfg = RollupConfig()
    t0 = rollup_oracle(spec, cfg)[0]
    t0 = t0[~t0["gap_filled"]]
    sample = {}
    for s in ("source_000", "source_001", "source_002"):
        g = t0[t0["source"] == s].sort_values("bucket").head(5)
        for _, r in g.iterrows():
            sample[(s, int(r["bucket"]))] = np.asarray(r["repr_series"], dtype=np.float64)

    tab = token_table_arrow(spec).to_pandas()
    ids = tab["doc_id"].str.slice(1).astype(np.int64).to_numpy()
    tab["bucket"] = derive_ts(ids, spec) // cfg.tier_widths[0]
    want = {}
    for did, toks, src, bkt in zip(tab["doc_id"], tab["tokens"], tab["source"], tab["bucket"]):
        rep = sample.get((src, int(bkt)))
        if rep is None:
            continue
        want[did] = ref_dtw.distance(np.asarray(toks, dtype=np.float64), rep, window=16)
    assert len(want) == len(got), (len(want), len(got))
    for did, d in zip(got["doc_id"], got["dist_to_repr"]):
        assert abs(d - want[did]) < 5e-6, (did, d, want[did])
    return (
        "reference dtw.distance(window=16) from each regenerated member to the "
        "single-process rollup_oracle's tier-0 representative (sampled groups)"
    )


def check_storage_efficiency(got: pd.DataFrame):
    import __ray_entry__ as E
    from dtaidistance_ray.pipelines.flagship import rollup_oracle
    from dtaidistance_ray.stages.rollup import RollupConfig, encode_frame

    spec = E._token_spec(SF_DIR)
    tiers = rollup_oracle(spec, RollupConfig())
    rows = []
    for t, frame in tiers.items():
        enc = encode_frame(frame)
        g = enc.assign(
            n_points=[len(r) for r in enc["repr_series"]],
            payload_bytes=[len(bytes(p)) for p in enc["repr_gorilla"]],
        ).groupby("source", sort=True)
        for src, gg in g:
            np_, pb = int(gg["n_points"].sum()), int(gg["payload_bytes"].sum())
            rows.append(
                {
                    "tier": int(t),
                    "source": src,
                    "n_buckets": len(gg),
                    "n_points": np_,
                    "payload_bytes": pb,
                    "raw_bytes": np_ * 8,
                    "ratio": round(pb / (np_ * 8), 6),
                }
            )
    want = canon(pd.DataFrame(rows))
    pd.testing.assert_frame_equal(canon(got.reset_index(drop=True)), want, check_dtype=False)
    return (
        "single-process rollup_oracle rows encoded with the same codec, "
        "reduced per (tier, source) independently of the distributed path"
    )


def _bpe_independent_merges(num_merges=200, min_freq=2):
    """Independent BPE learner: pandas word counting (explode +
    value_counts, not Counter partials) and the original Sennrich-script
    representation — each word as a SPACE-JOINED symbol string mutated
    with str.split scans — instead of bpe.py's tuple-dict vocab."""
    word_re = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
    docs = _read_docs()
    wc = docs["text"].map(word_re.findall).explode().dropna().value_counts()
    vocab = {}
    for w, c in wc.items():
        syms = list(w)
        syms[-1] += "</w>"
        key = " ".join(syms)
        vocab[key] = vocab.get(key, 0) + int(c)
    merges = []
    for _ in range(num_merges):
        stats = {}
        for key, cnt in vocab.items():
            syms = key.split(" ")
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + cnt
        if not stats:
            break
        best = sorted(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        (a, b), freq = best
        if freq < min_freq:
            break
        merges.append((a, b))
        nv = {}
        for key, cnt in vocab.items():
            syms = key.split(" ")
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k2 = " ".join(out)
            nv[k2] = nv.get(k2, 0) + cnt
        vocab = nv
    return merges


def check_bpe_train_merges(got: pd.DataFrame):
    merges = _bpe_independent_merges()
    want = pd.DataFrame(
        {
            "rank": pd.Series(range(len(merges)), dtype="int64"),
            "left": [m[0] for m in merges],
            "right": [m[1] for m in merges],
            "merged": [m[0] + m[1] for m in merges],
        }
    )
    pd.testing.assert_frame_equal(canon(want), canon(got.reset_index(drop=True)))
    return "independent learner (pandas explode/value_counts word table + space-joined-symbol Sennrich loop) reproduces the full merge table"


def _bpe_independent_encode(word, ranks):
    syms = list(word)
    syms[-1] += "</w>"
    while len(syms) > 1:
        ranked = [(ranks[(x, y)], i) for i, (x, y) in enumerate(zip(syms, syms[1:])) if (x, y) in ranks]
        if not ranked:
            break
        _, i = min(ranked)
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2 :]
    return syms


def check_bpe_encode_documents(got: pd.DataFrame):
    word_re = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
    merges = _bpe_independent_merges()
    ranks = {p: i for i, p in enumerate(merges)}
    docs = _read_docs()
    want = {}
    memo = {}
    for d, t in zip(docs["doc_id"].astype(int), docs["text"]):
        n_words = n_tok = n_single = crc = 0
        for w in word_re.findall(t):
            n_words += 1
            toks = memo.get(w)
            if toks is None:
                toks = _bpe_independent_encode(w, ranks)
                memo[w] = toks
            n_tok += len(toks)
            for tk in toks:
                if len(tk) == 1 or (len(tk) == 5 and tk.endswith("</w>")):
                    n_single += 1
                crc = zlib.crc32(tk.encode(), crc)
        want[int(d)] = (n_words, n_tok, n_single, crc)
    for d, nw, nt, ns, c in zip(
        got["doc_id"], got["n_words"], got["n_bpe_tokens"], got["n_single_char"], got["token_crc"]
    ):
        assert want[int(d)] == (int(nw), int(nt), int(ns), int(c)), d
    return "independent learner + independent lowest-rank-greedy encoder reproduce per-doc token counts and the order-sensitive token-stream CRC"


CHECKS = {
    "bpe_train_merges": check_bpe_train_merges,
    "bpe_encode_documents": check_bpe_encode_documents,
    "tokens_repr_fidelity": check_repr_fidelity,
    "tokens_storage_efficiency": check_storage_efficiency,
    "tokens_repr_drift": check_repr_drift,
    "ann_pq_topk": check_ann_pq_topk,
    "tokens_rollup_payload_crc": check_payload_crc,
    "embedding_pca_top": check_embedding_pca,
    "subsequence_knee_matches_tokens": check_subsequence_knee,
    "tokens_rollup_time_index": check_time_index,
    "tokens_rollup_tier0_full": check_tier0_full,
    "tokens_rollup_tier2_full": check_tier2_full,
    "ann_ivf_topk": check_ann_ivf_topk,
    "multimodal_decode_real": check_multimodal_decode_real,
    "multimodal_audio_features": check_multimodal_audio,
    "multimodal_audio_g711": check_multimodal_audio_g711,
    "multimodal_audio_flac": check_multimodal_audio_flac,
    "multimodal_decode_gif": check_multimodal_decode_gif,
    "multimodal_gif_frames": check_multimodal_gif_frames,
    "multimodal_video_mjpeg": check_multimodal_video_mjpeg,
    "events_profile_dtw_anomaly": check_profile_dtw_anomaly,
    "warping_path_lowmem_tokens": check_warping_path_lowmem,
    "warping_path_prob_tokens": check_warping_path_prob,
    "dtw_weighted_matrix": check_dtw_weighted_matrix,
    "explain_pairs_tokens": check_explain_pairs,
    "dtw_distance_matrix": check_dtw_distance_matrix,
    "subsequence_knn": check_subsequence_knn,
    "hierarchical_clusters_tokens": check_hierarchical,
    "nw_align_tokens": check_nw_align,
    "subsequence_alignment_tokens": check_subsequence_alignment,
    "ngram_jaccard_pairs": check_ngram_jaccard,
    "minhash_dedup_pairs": check_minhash_dedup_pairs,
    "doc_fingerprints": check_doc_fingerprints,
    "simhash_signatures": check_simhash,
    "minhash_signatures": check_minhash_signatures,
    "embedding_near_dup_pairs": check_embedding_near_dup,
    "tokens_rollup_tier0_repr": check_tier0_repr,
}

SELF_ONLY = {
    "kmeans_clusters_tokens": "self (our k-means RNG; reference delegates to different RNG stream)",
    "local_concurrences_tokens": "self (reference kbest_matches requires its compiled loco_cc)",
    "symbolize_tokens": "self (pipeline composition ours; SymbolAlignment parity in tests)",
    "doc_lang_id": "self (heuristic profile table is ours)",
    "multimodal_decode": "self (decode is a declared deterministic stub)",
}


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as E

    os.makedirs(OUT, exist_ok=True)
    qs = E.queries()
    names = sys.argv[1:] or list(E.GOLDEN_QUERIES)
    for name in names:
        df1 = run_query(qs, name)
        df2 = run_query(qs, name)
        pd.testing.assert_frame_equal(df1, df2)
        if name in CHECKS:
            PROVENANCE[name] = CHECKS[name](df1)
        else:
            PROVENANCE[name] = SELF_ONLY.get(name, "self")
        df1.to_parquet(os.path.join(OUT, f"{name}.parquet"), index=False)
        print(f"golden {name}: {len(df1)} rows [{PROVENANCE[name]}]", flush=True)

    # merge with prior runs' entries (partial regeneration keeps the rest)
    prov_path = os.path.join(OUT, "PROVENANCE.md")
    existing: dict[str, str] = {}
    if os.path.exists(prov_path):
        for line in open(prov_path):
            m = re.match(r"- `([^`]+)` — (.*)", line)
            if m:
                existing[m.group(1)] = m.group(2)
    existing.update(PROVENANCE)
    with open(prov_path, "w") as f:
        f.write(
            "# Golden provenance\n\nEach golden is the canonically-sorted sf0.01 query "
            "output, generated by tools/make_goldens.py after (a) a same-session "
            "determinism double-run and (b) the independent verification below.\n\n"
        )
        for name in sorted(existing):
            f.write(f"- `{name}` — {existing[name]}\n")
    ray.shutdown()


if __name__ == "__main__":
    main()
