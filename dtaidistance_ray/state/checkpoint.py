"""Per-partition checkpoint manifests: lineage + metrics + resume.

The reference has no checkpointing (a SIGINT handler at best,
dd_dtw.h:26-30); the north rule requires per-partition lineage +
metrics and resumability. Layout:

    out_dir/tier=T/shard=K/part-0.parquet     (written atomically)
    out_dir/tier=T/shard=K/_manifest.json

A shard is the unit of resume: on rerun, shards whose manifest
validates (same settings hash + input fingerprint) are skipped. Writes
go to a temp dir first and are renamed into place, so a crashed task
never leaves a half-written shard that passes validation.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import asdict, dataclass
from typing import Dict, List, Optional, Set

import pyarrow as pa
import pyarrow.parquet as pq


@dataclass
class ShardManifest:
    tier: int
    shard: int
    num_rows: int
    settings_hash: str
    input_fingerprint: str
    sources: List[str]
    wall_time_s: float
    written_at: float
    file: str
    # the sharding scheme (total shard count) these rows were hashed
    # under: resume validation must reject a manifest written under a
    # DIFFERENT scheme (e.g. after compact_store renumbered shards), or
    # a partial resume would recompute sources already present in the
    # renumbered shards and duplicate rows. 0 = unknown (legacy stores).
    num_shards: int = 0

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)


def _parse_shard_name(name: str) -> Optional[int]:
    """shard dir name -> shard id, or None for anything that is not an
    exact ``shard=<int>`` (``.tmp-`` / ``.old-`` swap leftovers must
    never parse as live shards — they crashed compact_store/store_stats
    with ValueError before this existed)."""
    if not name.startswith("shard="):
        return None
    suffix = name.split("=", 1)[1]
    return int(suffix) if suffix.isdigit() else None


def shard_dir(out_dir: str, tier: int, shard: int) -> str:
    return os.path.join(out_dir, f"tier={tier}", f"shard={shard}")


def write_shard_atomic(
    out_dir: str,
    tier: int,
    shard: int,
    table: pa.Table,
    settings_hash: str,
    input_fingerprint: str,
    wall_time_s: float,
    num_shards: int = 0,
) -> ShardManifest:
    """Write one shard's parquet + manifest via tmp-dir rename."""
    final = shard_dir(out_dir, tier, shard)
    tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    fname = "part-0.parquet"
    pq.write_table(table, os.path.join(tmp, fname))
    sources = sorted(set(table["source"].to_pylist())) if "source" in table.column_names else []
    manifest = ShardManifest(
        tier=tier,
        shard=shard,
        num_rows=table.num_rows,
        settings_hash=settings_hash,
        input_fingerprint=input_fingerprint,
        sources=sources,
        wall_time_s=wall_time_s,
        written_at=time.time(),
        file=fname,
        num_shards=num_shards,
    )
    with open(os.path.join(tmp, "_manifest.json"), "w") as f:
        f.write(manifest.to_json())
    if os.path.isdir(final):
        shutil.rmtree(final)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    os.rename(tmp, final)
    return manifest


def read_manifest(out_dir: str, tier: int, shard: int) -> Optional[Dict]:
    p = os.path.join(shard_dir(out_dir, tier, shard), "_manifest.json")
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return None


def completed_shards(
    out_dir: str,
    tier: int,
    settings_hash: str,
    input_fingerprint: str,
    num_shards: Optional[int] = None,
) -> Set[int]:
    """Shards whose manifest validates against the current run's lineage.

    When ``num_shards`` is given, a manifest written under a DIFFERENT
    sharding scheme (or a legacy/compacted one that did not record it)
    does NOT validate: shard ids are crc32(source) % num_shards, so a
    resume under a stale count would skip renumbered shards' sources
    while they are also recomputed into other shard ids — duplicating
    rows. Safe failure mode is a full recompute (overwrites in place)."""
    tier_dir = os.path.join(out_dir, f"tier={tier}")
    done: Set[int] = set()
    if not os.path.isdir(tier_dir):
        return done
    for name in os.listdir(tier_dir):
        shard = _parse_shard_name(name)
        if shard is None:
            continue
        m = read_manifest(out_dir, tier, shard)
        if (
            m
            and m.get("settings_hash") == settings_hash
            and m.get("input_fingerprint") == input_fingerprint
            and (num_shards is None or m.get("num_shards") == num_shards)
            and os.path.exists(os.path.join(tier_dir, name, m.get("file", "")))
        ):
            done.add(shard)
    return done


def prune_invalid_shards(
    out_dir: str,
    tier: int,
    settings_hash: str,
    input_fingerprint: str,
    num_shards: Optional[int] = None,
) -> List[int]:
    """Remove shard dirs that do NOT validate against the current run's
    lineage (settings hash + input fingerprint + sharding scheme),
    returning their ids. Called by the writer before recomputing a
    tier: a recompute only overwrites the shard ids its sources hash
    to, so a stale-scheme dir at an id the new data never touches
    (e.g. a compacted ``shard=1`` after a resume under the original
    count) would otherwise linger with rows that were also recomputed
    into other shards — duplicate data at rest. Pruned dirs are by
    definition recomputable from the input; crash-safe (a dir is
    either fully removed or still invalid on the next run)."""
    tier_dir = os.path.join(out_dir, f"tier={tier}")
    if not os.path.isdir(tier_dir):
        return []
    valid = completed_shards(out_dir, tier, settings_hash, input_fingerprint, num_shards)
    pruned = []
    for name in sorted(os.listdir(tier_dir)):
        shard = _parse_shard_name(name)
        if shard is None or shard in valid:
            continue
        shutil.rmtree(os.path.join(tier_dir, name), ignore_errors=True)
        pruned.append(shard)
    return pruned


def expire_checkpoint(
    out_dir: str,
    keeps=(48, 42, None),
    widths=(3600, 14400, 86400),
) -> Dict:
    """Retention sweep over a checkpointed rollup store: per tier,
    rewrite every shard keeping only buckets newer than the tier's TTL
    (tier cutoffs derive exactly from the global tier-0 max bucket,
    since widths are integer multiples; a ``None`` keep means forever).

    Each rewrite is atomic (tmp dir + rename, same as the writer) and
    the manifest keeps its lineage fields — a resumed run still
    validates and skips the shard — while gaining a ``retention``
    record (cutoff bucket, rows dropped, sweep time) so the expiry is
    itself auditable lineage.

    Shard rewrites are independent: when a Ray session is up each one
    runs as its own ray.remote task (same shared-storage contract as
    the writer); the sequential fallback calls the same function
    inline."""
    import glob as _glob

    import pyarrow.compute as _pc

    tier0_files = sorted(_glob.glob(os.path.join(out_dir, "tier=0", "shard=*", "*.parquet")))
    if not tier0_files:
        return {"expired": {}, "max_bucket0": None}
    mb0 = None
    for f in tier0_files:
        col = pq.read_table(f, columns=["bucket"])["bucket"]
        if col.length():
            m = _pc.max(col).as_py()
            mb0 = m if mb0 is None else max(mb0, m)
    metrics: Dict = {"expired": {}, "max_bucket0": mb0}
    if mb0 is None:
        return metrics
    try:
        import ray

        parallel = ray.is_initialized()
    except ImportError:
        parallel = False
    for t, keep in enumerate(keeps):
        if keep is None:
            continue
        w_ratio = widths[t] // widths[0]
        cut = mb0 // w_ratio - keep
        tier_dir = os.path.join(out_dir, f"tier={t}")
        if not os.path.isdir(tier_dir):
            continue
        _recover_shard_leftovers(tier_dir)  # promote/restore a crashed swap first
        jobs = []
        for name in sorted(os.listdir(tier_dir)):
            shard = _parse_shard_name(name)  # None for leftovers/foreign dirs
            if shard is None:
                continue
            if read_manifest(out_dir, t, shard):
                jobs.append((out_dir, t, shard, int(cut)))
        if parallel:
            import ray

            fn = ray.remote(_expire_rewrite_shard)
            dropped = ray.get([fn.remote(*j) for j in jobs])
        else:
            dropped = [_expire_rewrite_shard(*j) for j in jobs]
        metrics["expired"][t] = {
            "cutoff_bucket": int(cut),
            "rows_dropped": int(sum(dropped)),
        }
    return metrics


def _recover_shard_leftovers(tier_dir: str) -> None:
    """Crash recovery for the per-shard atomic swap: a crash between the
    swap's two renames leaves ``shard=N.old-*`` / ``shard=N.tmp-*`` with
    no ``shard=N``. Promote an orphaned ``.tmp-`` (it holds a COMPLETE
    rewritten shard + manifest — it is only ever renamed after being
    fully written), else restore the ``.old-`` copy; only then delete
    the remaining leftovers. Idempotent; safe to run before any sweep."""
    import glob as _glob

    if not os.path.isdir(tier_dir):
        return
    # .tmp- entries FIRST: a complete orphaned .tmp- is the finished
    # rewrite and must win over the pre-sweep .old- copy (plain sorted()
    # visits '.old-' first and would restore the stale copy, then throw
    # the completed retention work away — safe but wasteful and the
    # opposite of the documented promotion order).
    leftovers = sorted(_glob.glob(os.path.join(tier_dir, "shard=*.tmp-*"))) + sorted(
        _glob.glob(os.path.join(tier_dir, "shard=*.old-*"))
    )
    for path in leftovers:
        if not os.path.isdir(path):
            continue  # already consumed by a prior promotion this pass
        base = os.path.basename(path)
        final = os.path.join(tier_dir, base.split(".", 1)[0])
        complete = os.path.isfile(os.path.join(path, "_manifest.json"))
        if not os.path.isdir(final) and complete:
            os.rename(path, final)
        else:
            shutil.rmtree(path, ignore_errors=True)


def _expire_rewrite_shard(out_dir: str, t: int, shard: int, cut: int) -> int:
    """Atomically rewrite ONE shard keeping buckets newer than the TTL
    cutoff; returns rows dropped. Module-level pure function of its
    arguments so it runs as a ray.remote task unchanged. The swap is
    crash-safe at every point: final -> .old-, .tmp- -> final, then
    drop the .old- — a crash leaves either the old shard, or the new
    one, or an orphaned complete .tmp- that _recover_shard_leftovers
    promotes on the next sweep (never zero copies)."""
    import pyarrow.compute as _pc

    m = read_manifest(out_dir, t, shard)
    if not m:
        return 0
    final = shard_dir(out_dir, t, shard)
    table = pq.read_table(os.path.join(final, m["file"]))
    kept = table.filter(_pc.greater(table["bucket"], cut))
    dropped = table.num_rows - kept.num_rows
    if dropped == 0:
        return 0
    tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(kept, os.path.join(tmp, m["file"]))
    m2 = dict(m)
    m2["num_rows"] = kept.num_rows
    m2.setdefault("retention", []).append(
        {"cutoff_bucket": int(cut), "rows_dropped": int(dropped), "swept_at": time.time()}
    )
    with open(os.path.join(tmp, "_manifest.json"), "w") as fh:
        json.dump(m2, fh, sort_keys=True)
    old = final + f".old-{uuid.uuid4().hex[:8]}"
    os.rename(final, old)
    os.rename(tmp, final)
    shutil.rmtree(old)
    return int(dropped)


def _compact_build_shard(
    input_files: List[str],
    tier: int,
    k: int,
    target_shards: int,
    staged: str,
    settings_hash: str,
    input_fingerprint: str,
    retention: List,
    comp_rec: Dict,
) -> int:
    """Build ONE compacted output shard: read the tier's input shard
    files, keep rows whose crc32(source) lands on k, write the staged
    shard dir + manifest. Pure function of its arguments (module-level
    so it runs as a ray.remote task unchanged); reading all inputs per
    output shard is a deliberate target_shards-x read amplification —
    inputs are columnar and tier rows key-space-bounded; at extreme
    tier sizes swap this for a Dataset hash shuffle."""
    import zlib as _zlib

    tables = [pq.read_table(f) for f in input_files]
    merged = pa.concat_tables(tables)
    src = merged["source"].to_pylist()
    mask = pa.array([_zlib.crc32(x.encode()) % target_shards == k for x in src])
    part = merged.filter(mask)
    sdir = os.path.join(staged, f"shard={k}")
    os.makedirs(sdir, exist_ok=True)
    fname = "part-0.parquet"
    pq.write_table(part, os.path.join(sdir, fname))
    # reuse the writer's dataclass so the manifest schema cannot fork
    # between write_shard_atomic and the compactor; num_shards records
    # the NEW scheme so completed_shards(num_shards=old) rejects a
    # stale-scheme resume instead of duplicating rows
    man = asdict(
        ShardManifest(
            tier=tier,
            shard=k,
            num_rows=part.num_rows,
            settings_hash=settings_hash,
            input_fingerprint=input_fingerprint,
            sources=sorted(set(part["source"].to_pylist()))
            if "source" in part.column_names
            else [],
            wall_time_s=0.0,
            written_at=time.time(),
            file=fname,
            num_shards=target_shards,
        )
    )
    man["compaction"] = comp_rec
    if retention:
        man["retention"] = retention
    with open(os.path.join(sdir, "_manifest.json"), "w") as fh:
        json.dump(man, fh, sort_keys=True)
    return part.num_rows


def compact_store(
    out_dir: str,
    target_shards: int = 2,
    parallel: Optional[bool] = None,
) -> Dict:
    """Compact each tier's shards into a bounded shard count (the LSM /
    segment-merge maintenance pass every long-lived rollup store needs:
    retention sweeps and incremental refreshes leave many small shard
    files; reads want few).

    Rows are preserved byte-identically — only the shard assignment
    changes (same crc32 source-hash rule as the writer, so the
    "one shard file per source per tier" serve invariant still holds).
    The swap is atomic per tier: new shards are staged under a tmp tier
    dir, the old tier dir is renamed away, the staged dir renamed in,
    then the old tree removed — a crash at any point leaves either the
    old layout, or the new one plus a ``.old-`` leftover that readers
    ignore (they glob ``tier=T/shard=*``) and the next compaction
    clears. Manifests keep their lineage fields (settings hash / input
    fingerprint, retention records) and gain a ``compaction`` record,
    so the merge is itself auditable lineage; shard numbering changes,
    and the manifests record the NEW scheme (``num_shards`` =
    target_shards), so completed_shards() rejects a resume under the
    stale pre-compaction count instead of silently duplicating rows.

    Output shards build in PARALLEL as one ray.remote task each when a
    Ray session is up (parallel=None autodetects; the store must be on
    storage all workers see, same contract as the writer); the swap
    stays driver-side and atomic. Sequential fallback is the same
    function called inline."""
    import glob as _glob

    metrics: Dict = {"tiers": {}}
    # RECOVER before clearing: a crash between the swap's two renames
    # leaves no tier=T dir but a complete tier=T.old-* (the entire
    # pre-compaction layout) and a staged tier=T.tmp-*. Restore the
    # .old- copy first — deleting leftovers while tier=T is absent
    # would permanently lose the tier.
    for old in sorted(_glob.glob(os.path.join(out_dir, "tier=*.old-*"))):
        tier_path = old.split(".old-", 1)[0]
        if not os.path.isdir(tier_path):
            os.rename(old, tier_path)
    # now clear remaining leftovers (readers never matched them: they
    # glob the exact "tier=T/shard=*" path)
    for leftover in _glob.glob(os.path.join(out_dir, "tier=*.old-*")) + _glob.glob(
        os.path.join(out_dir, "tier=*.tmp-*")
    ):
        shutil.rmtree(leftover, ignore_errors=True)
    if parallel is None:
        try:
            import ray

            parallel = ray.is_initialized()
        except ImportError:
            parallel = False
    pending = []  # (tier, tier_path, staged, old_suffix, n_inputs, futures/rows)
    for tier_path in sorted(_glob.glob(os.path.join(out_dir, "tier=*"))):
        base = os.path.basename(tier_path)
        if ".tmp-" in base or ".old-" in base:
            continue
        t = int(base.split("=", 1)[1])
        # promote/restore any crashed per-shard expire swap first, so a
        # completed .tmp- rewrite is compacted rather than discarded and
        # a .old- leftover cannot crash the shard-name parse below
        _recover_shard_leftovers(tier_path)
        shard_names = sorted(
            n for n in os.listdir(tier_path) if _parse_shard_name(n) is not None
        )
        input_files, manifests = [], []
        for name in shard_names:
            shard = _parse_shard_name(name)
            m = read_manifest(out_dir, t, shard)
            if not m:
                continue
            input_files.append(os.path.join(tier_path, name, m["file"]))
            manifests.append(m)
        if not input_files:
            continue
        shash = {m.get("settings_hash") for m in manifests}
        ifp = {m.get("input_fingerprint") for m in manifests}
        retention: List = []
        for m in manifests:
            retention.extend(m.get("retention", []))
        staged = tier_path + f".tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(staged, exist_ok=True)
        comp_rec = {
            "merged_from": len(manifests),
            "target_shards": target_shards,
            "compacted_at": time.time(),
        }
        args_per_k = [
            (
                input_files,
                t,
                k,
                target_shards,
                staged,
                shash.copy().pop() if len(shash) == 1 else "mixed",
                ifp.copy().pop() if len(ifp) == 1 else "mixed",
                # tier-level audit history rides in shard 0 ONLY: copying
                # the union into every shard duplicated retention records
                # ~target_shards-fold per expire+compact cycle (round-5
                # review finding), over-counting rows_dropped in audits
                retention if k == 0 else [],
                comp_rec,
            )
            for k in range(target_shards)
        ]
        if parallel:
            import ray

            fn = ray.remote(_compact_build_shard)
            futures = [fn.remote(*a) for a in args_per_k]
        else:
            futures = [_compact_build_shard(*a) for a in args_per_k]
        pending.append((t, tier_path, staged, len(manifests), futures))

    for t, tier_path, staged, n_inputs, futures in pending:
        if parallel:
            import ray

            rows = ray.get(futures)
        else:
            rows = futures
        old = tier_path + f".old-{uuid.uuid4().hex[:8]}"
        os.rename(tier_path, old)
        os.rename(staged, tier_path)
        shutil.rmtree(old)
        metrics["tiers"][t] = {
            "shards_before": n_inputs,
            "shards_after": target_shards,
            "rows": int(sum(rows)),
        }
    return metrics


def store_stats(out_dir: str, tiers=(0, 1, 2)):
    """Per-tier integrity stats of a tiered store: row count and bucket
    span from the parquet files, CROSS-CHECKED against the manifests —
    a manifest whose num_rows disagrees with its shard's parquet raises
    (torn write, manual tampering, or a compaction bug). Returns a list
    of {tier, n_rows, min_bucket, max_bucket} dicts."""
    import glob as _glob

    rows = []
    for t in tiers:
        n = 0
        man_n = 0
        mn = mx = None
        for sd in sorted(_glob.glob(os.path.join(out_dir, f"tier={t}", "shard=*"))):
            shard = _parse_shard_name(os.path.basename(sd))
            if shard is None:  # .tmp-/.old- swap leftovers: not live shards
                continue
            m = read_manifest(out_dir, t, shard)
            man_n += int(m["num_rows"]) if m else 0
            for fp in _glob.glob(os.path.join(sd, "*.parquet")):
                tb = pq.read_table(fp, columns=["bucket"])
                n += tb.num_rows
                if tb.num_rows:
                    b = tb["bucket"].to_pandas()
                    mn = int(b.min()) if mn is None else min(mn, int(b.min()))
                    mx = int(b.max()) if mx is None else max(mx, int(b.max()))
        if man_n != n:
            raise AssertionError(f"tier {t}: manifests say {man_n} rows, parquet has {n}")
        rows.append({"tier": t, "n_rows": n, "min_bucket": mn, "max_bucket": mx})
    return rows
