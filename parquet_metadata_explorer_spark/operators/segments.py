"""Log-structured segment commit machinery shared by the at-rest
indexes (the BM25 inverted index and the IVF-PQ code index): batch
data lives under immutable ``<partition>=…/batch=<id>`` directories
and becomes visible only when its one-row commit file lands in
``commits/`` — a Lucene-commit-point-style protocol that makes torn
writes invisible (never half-counted), replays idempotent when the
pipeline supplies its own batch id, and concurrent increments safe
(disjoint partitions, separate commit files, no shared mutable file).

Both index types share these helpers VERBATIM so the lifecycle
semantics — what "committed" means, how torn segments are vacuumed,
how the compaction swap publishes and recovers — cannot drift between
them. Everything here is driver-side filesystem metadata work (commit
logs hold one tiny row per batch) except the two tombstone helpers,
which read/write the deletion set as ordinary Spark relations so both
indexes share the delete protocol verbatim too.
"""

from __future__ import annotations

BASE_BATCH = "base"


def validate_batch_id(batch_id: str) -> None:
    """Filesystem-safe ``[A-Za-z0-9_-]``; ``base`` is reserved for the
    full build / compaction output."""
    import re

    if batch_id == BASE_BATCH or not re.fullmatch(r"[A-Za-z0-9_-]+", batch_id):
        raise ValueError(
            f"Invalid batch_id: {batch_id!r} (filesystem-safe "
            "[A-Za-z0-9_-], 'base' is reserved for the full build)"
        )


def segment_commit(path: str, batch_id: str, stats: dict) -> None:
    """Append one batch's commit row as its own file — temp name
    (dot-prefixed, so a crashed write is invisible to every reader) +
    os.replace, the atomic publish. ``stats`` maps column name to an
    int (per-index corpus constants, summed at read time). A batch
    with no commit file does not exist as far as any probe is
    concerned."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    commits = f"{path}/commits"
    os.makedirs(commits, exist_ok=True)
    table = pa.table(
        {
            "batch": pa.array([batch_id], pa.string()),
            **{k: pa.array([int(v)], pa.int64()) for k, v in sorted(stats.items())},
        }
    )
    tmp = f"{commits}/.commit-{batch_id}.parquet.tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, f"{commits}/commit-{batch_id}.parquet")


def segment_committed(path: str, batch_id: str) -> bool:
    import os

    return os.path.exists(f"{path}/commits/commit-{batch_id}.parquet")


def segment_commits(path: str, label: str) -> dict:
    """{batch_id: {stat: int}} for every COMMITTED batch — the probes'
    visibility set. Raises loudly on an index with no commit log
    (legacy layout or an interrupted base build) instead of silently
    scoring against nothing."""
    import os

    import pyarrow.parquet as pq

    commits = f"{path}/commits"
    out = {}
    if os.path.isdir(commits):
        for f in sorted(os.listdir(commits)):
            if f.startswith("commit-") and f.endswith(".parquet"):
                d = pq.read_table(f"{commits}/{f}").to_pydict()
                out[d["batch"][0]] = {
                    k: int(v[0]) for k, v in d.items() if k != "batch"
                }
    if not out:
        raise ValueError(
            f"{label} at {path} has no committed batches (legacy "
            "layout or interrupted build) — rebuild the index"
        )
    return out


def vacuum_uncommitted(path: str, tables, committed: set) -> None:
    """Delete segment dirs whose batch id has no commit row — dead
    data from crashed increments that a retry under a FRESH random id
    would otherwise strand forever. ``tables`` are the two-level
    partitioned relations under ``path`` (outer partition dir, then
    ``batch=<id>``) or one-level ones (``batch=<id>`` directly under
    the table root — the tombstones layout)."""
    import os
    import shutil

    for table in tables:
        root = f"{path}/{table}"
        if not os.path.isdir(root):
            continue
        for outer in os.listdir(root):
            odir = f"{root}/{outer}"
            if "=" not in outer or not os.path.isdir(odir):
                continue
            if (
                outer.startswith("batch=")
                and outer[len("batch=") :] not in committed
            ):
                shutil.rmtree(odir, ignore_errors=True)
                continue
            for seg_dir in os.listdir(odir):
                if (
                    seg_dir.startswith("batch=")
                    and seg_dir[len("batch=") :] not in committed
                ):
                    shutil.rmtree(f"{odir}/{seg_dir}", ignore_errors=True)


def mint_generation(path: str) -> str:
    """Mint a fresh index GENERATION token — written by every base
    build and every compaction build, because both REUSE the ``base``
    batch id: without the token, a snapshot pinned on ``{base}`` would
    silently alias a different folded state after maintenance."""
    import os
    import uuid

    os.makedirs(path, exist_ok=True)
    gen = uuid.uuid4().hex
    tmp = f"{path}/.GENERATION.tmp"
    with open(tmp, "w") as f:
        f.write(gen)
    os.replace(tmp, f"{path}/GENERATION")
    return gen


def read_generation(path: str):
    import os

    p = f"{path}/GENERATION"
    if not os.path.exists(p):
        return None  # pre-generation index layout
    with open(p) as f:
        return f.read().strip()


def resolve_snapshot(commits: dict, snapshot, label: str, generation=None):
    """Restrict a probe's visibility set to a PINNED snapshot — the
    snapshot-isolation read: a pin captured before concurrent
    increments/deletes landed keeps serving exactly the pinned state
    (an eval run stays internally consistent on a moving index).
    ``snapshot=None`` means the live commit set; otherwise it is the
    dict a ``*_index_snapshot`` helper returned ({generation,
    batches}; set ``"unchecked": True`` in the dict to skip the
    generation guard — the explicit opt-in that replaced the old
    silent bare-list escape hatch, which could alias a compacted
    state without any error). Raises if the pin crosses a compaction
    or rebuild — batch ids fold away AND ``base`` is reused, so the
    generation token is what makes invalidation loud instead of a
    silent alias of a state that never existed."""
    if snapshot is None:
        return commits
    if not isinstance(snapshot, dict):
        raise ValueError(
            f"{label}: snapshot must be the dict an *_index_snapshot "
            "helper returned ({'generation': ..., 'batches': [...]}) — "
            f"got {type(snapshot).__name__}. A bare batch list skips "
            "the generation guard and can silently alias a compacted "
            "state; to opt into that risk explicitly, pass "
            "{'batches': [...], 'unchecked': True}."
        )
    if not snapshot.get("unchecked", False):
        # ANY generation mismatch invalidates — including None vs a
        # token: every build and compaction mints one, so a pin
        # without a token against a token-bearing index means the
        # index was rebuilt since (the silent-alias case). Only a
        # legacy pin against a legacy index (both None) passes on the
        # batch check alone.
        if snapshot.get("generation") != generation:
            raise ValueError(
                f"{label}: snapshot was taken on a different index "
                "generation (the index was compacted or rebuilt since "
                "the pin) — take a new snapshot."
            )
    batches = snapshot.get("batches")
    if batches is None:
        raise ValueError(
            f"{label}: snapshot dict has no 'batches' key — expected "
            "the {'generation': ..., 'batches': [...]} shape an "
            "*_index_snapshot helper returns."
        )
    missing = sorted(set(batches) - set(commits))
    if missing:
        raise ValueError(
            f"{label}: snapshot references batches missing from the "
            f"commit log ({missing}) — the index was compacted or "
            "rebuilt since the pin; take a new snapshot."
        )
    return {b: commits[b] for b in batches}


def tombstone_ids(spark, path: str, id_col: str, batches):
    """The committed deletion set of an index: a DataFrame of the ids
    whose rows every probe must anti-join away, or ``None`` when the
    index has no ``tombstones`` table at all (the common no-deletes
    case — callers skip the anti-join entirely, so indexes that never
    delete pay nothing). Tombstone segments ride the SAME commit log
    as data segments (one-level ``tombstones/batch=<id>`` partitions),
    so the ``batches`` visibility filter makes torn deletes invisible
    exactly like torn increments."""
    import os

    from pyspark.sql import functions as F

    root = f"{path}/tombstones"
    # an empty dir (every segment vacuumed) counts as no tombstones —
    # reading it would fail schema inference
    if not os.path.isdir(root) or not any(
        e.startswith("batch=") for e in os.listdir(root)
    ):
        return None
    return (
        spark.read.parquet(f"{path}/tombstones")
        .filter(F.col("batch").isin(sorted(batches)))
        .select(id_col)
    )


def write_tombstones(ids, path: str, batch_id: str) -> None:
    """Land one delete batch's id rows under their own
    ``tombstones/batch=<id>`` partition — dynamic partition overwrite,
    the same idempotent-retry shape as data segments (a torn earlier
    attempt of the SAME batch id is replaced, other batches' files are
    never rewritten). The caller commits LAST, so data-without-commit
    is invisible to ``tombstone_ids``."""
    from pyspark.sql import functions as F

    (
        ids.withColumn("batch", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(f"{path}/tombstones")
    )


def recover_retired(path: str) -> None:
    """Heal the compaction swap's crash window: if the live path is
    missing but the deterministic ``<path>.retired`` sibling exists,
    rename it back before proceeding. Called on EVERY index open
    (probe, increment, compact) — recovery-on-open, the Lucene
    convention — so a crashed swap never strands readers behind a
    misleading 'no committed batches' error until the next maintenance
    run. Two openers racing the rename are safe: the loser's rename
    fails and the live path exists either way."""
    import os

    if not os.path.exists(path) and os.path.exists(f"{path}.retired"):
        try:
            os.rename(f"{path}.retired", path)
        except OSError:
            pass  # a racing opener already recovered it


def clear_stale_builds(path: str, prefix: str) -> None:
    """Delete leftover ``<path>.<prefix>-<pid>`` build dirs from
    crashed compactions — pid-keyed names mean a retry under a new pid
    would otherwise strand a full index-sized copy forever. Safe under
    the single-maintenance-owner discipline compaction already
    requires."""
    import glob
    import shutil

    for stale in glob.glob(f"{path}.{prefix}-*"):
        shutil.rmtree(stale, ignore_errors=True)


def swap_publish(path: str, build: str) -> None:
    """Publish a compacted index over the live one with directory
    renames (live → .retired, build → live), then drop the retired
    copy — a crash mid-swap leaves a complete index either live or at
    the DETERMINISTIC retired name, which ``recover_retired`` renames
    back on the next maintenance run. Not atomic against writers: the
    single-maintenance-owner discipline applies."""
    import os
    import shutil

    retired = f"{path}.retired"
    shutil.rmtree(retired, ignore_errors=True)
    os.rename(path, retired)
    os.rename(build, path)
    shutil.rmtree(retired, ignore_errors=True)
