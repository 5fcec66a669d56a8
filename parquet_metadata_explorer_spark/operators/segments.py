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

Every filesystem touch routes through ``operators/lakefs.py`` (the
pyarrow.fs shim), so the maintenance plane runs unchanged against a
local directory or an object-store URI. Two publish disciplines
coexist (see lakefs's module docstring for the exact semantics):

- **flat layout** (the default): the index lives directly at ``path``;
  compaction publishes with directory renames (``swap_publish``) —
  POSIX/HDFS only.
- **pointer layout** (``write_*_index(layout="pointer")``): the live
  index lives at ``path/<generation-dir>`` named by the one-object
  ``path/CURRENT`` pointer. Publishes build a complete sibling
  generation and atomically flip CURRENT (atomic PUT — no rename
  anywhere in the lifecycle), then vacuum unreferenced generations
  (delete-after-commit). ``resolve_index_root`` is the one resolution
  point every open goes through, so probes/increments/deletes/fsck
  are layout-agnostic. Retained generations (``vacuum=False``) keep
  serving IN-FLIGHT scans across a compaction — the grace-period
  story for pinned readers; ``vacuum_generations`` reclaims them
  later.
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
    """Append one batch's commit row as its own file — an all-or-
    nothing small-file publish through the lakefs shim (temp+move on
    POSIX, atomic single-object PUT on object stores). ``stats`` maps
    column name to an int (per-index corpus constants, summed at read
    time). A batch with no commit file does not exist as far as any
    probe is concerned."""
    import pyarrow as pa

    from .lakefs import for_path

    lake, p = for_path(path)
    commits = f"{p}/commits"
    lake.mkdirs(commits)
    table = pa.table(
        {
            "batch": pa.array([batch_id], pa.string()),
            **{k: pa.array([int(v)], pa.int64()) for k, v in sorted(stats.items())},
        }
    )
    lake.write_table(table, f"{commits}/commit-{batch_id}.parquet")


def segment_committed(path: str, batch_id: str) -> bool:
    from .lakefs import for_path

    lake, p = for_path(path)
    return lake.exists(f"{p}/commits/commit-{batch_id}.parquet")


def segment_commits(path: str, label: str) -> dict:
    """{batch_id: {stat: int}} for every COMMITTED batch — the probes'
    visibility set. Raises loudly on an index with no commit log
    (legacy layout or an interrupted base build) instead of silently
    scoring against nothing."""
    from .lakefs import for_path

    lake, p = for_path(path)
    commits = f"{p}/commits"
    out = {}
    for f in lake.listdir(commits):
        if f.startswith("commit-") and f.endswith(".parquet"):
            d = lake.read_table(f"{commits}/{f}").to_pydict()
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
    the table root — the tombstones layout). Pure delete-after-commit:
    everything removed was already invisible to every probe, so a
    crash mid-vacuum strands debris, never breaks an index."""
    from .lakefs import for_path

    lake, p = for_path(path)
    for table in tables:
        root = f"{p}/{table}"
        for outer in lake.listdir(root):
            odir = f"{root}/{outer}"
            if "=" not in outer or not lake.isdir(odir):
                continue
            if (
                outer.startswith("batch=")
                and outer[len("batch=") :] not in committed
            ):
                lake.rmtree(odir)
                continue
            for seg_dir in lake.listdir(odir):
                if (
                    seg_dir.startswith("batch=")
                    and seg_dir[len("batch=") :] not in committed
                ):
                    lake.rmtree(f"{odir}/{seg_dir}")


def mint_generation(path: str) -> str:
    """Mint a fresh index GENERATION token — written by every base
    build and every compaction build, because both REUSE the ``base``
    batch id: without the token, a snapshot pinned on ``{base}`` would
    silently alias a different folded state after maintenance."""
    import uuid

    from .lakefs import for_path

    lake, p = for_path(path)
    lake.mkdirs(p)
    gen = uuid.uuid4().hex
    lake.write_text(f"{p}/GENERATION", gen)
    return gen


def read_generation(path: str):
    from .lakefs import for_path

    lake, p = for_path(path)
    if not lake.exists(f"{p}/GENERATION"):
        return None  # pre-generation index layout
    return lake.read_text(f"{p}/GENERATION").strip()


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
    from pyspark.sql import functions as F

    from .lakefs import for_path

    lake, p = for_path(path)
    # an empty dir (every segment vacuumed) counts as no tombstones —
    # reading it would fail schema inference
    if not any(
        e.startswith("batch=") for e in lake.listdir(f"{p}/tombstones")
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
    fails and the live path exists either way. Pointer-layout indexes
    never hit this path (their root always exists; publishes are
    CURRENT flips), so the rename requirement stays POSIX-only."""
    from .lakefs import for_path

    lake, p = for_path(path)
    if not lake.exists(p) and lake.exists(f"{p}.retired"):
        try:
            lake.move(f"{p}.retired", p)
        except OSError:
            pass  # a racing opener already recovered it


def clear_stale_builds(path: str, prefix: str) -> None:
    """Delete leftover ``<path>.<prefix>-<pid>`` build dirs from
    crashed compactions — pid-keyed names mean a retry under a new pid
    would otherwise strand a full index-sized copy forever. Safe under
    the single-maintenance-owner discipline compaction already
    requires."""
    import posixpath

    from .lakefs import for_path

    lake, p = for_path(path)
    parent, base = posixpath.split(p.rstrip("/"))
    for entry in lake.listdir(parent or "."):
        if entry.startswith(f"{base}.{prefix}-"):
            lake.rmtree(f"{parent}/{entry}" if parent else entry)


def swap_publish(path: str, build: str) -> None:
    """Publish a compacted index over the live one with directory
    renames (live → .retired, build → live), then drop the retired
    copy — a crash mid-swap leaves a complete index either live or at
    the DETERMINISTIC retired name, which ``recover_retired`` renames
    back on the next maintenance run. Not atomic against writers: the
    single-maintenance-owner discipline applies. Rename-capable
    filesystems only (POSIX/HDFS) — object-store indexes use the
    pointer layout, whose publish is ``publish_generation`` (CURRENT
    flip, no rename)."""
    from .lakefs import for_path

    lake, p = for_path(path)
    build_p = for_path(build)[1]
    retired = f"{p}.retired"
    lake.rmtree(retired)
    lake.move(p, retired)
    lake.move(build_p, p)
    lake.rmtree(retired)


# -- pointer-generation layout (object-store publishes) ---------------

GEN_PREFIX = "gen-"
CURRENT_POINTER = "CURRENT"


def pointer_layout(path: str) -> bool:
    """True when ``path`` is a pointer-layout index root (holds a
    CURRENT pointer naming the live generation dir)."""
    from .lakefs import for_path

    lake, p = for_path(path)
    return lake.exists(f"{p}/{CURRENT_POINTER}")


def ensure_spark_data_plane(spark, path: str, what: str) -> None:
    """Fail with ONE clear capability error when Spark's DATA plane
    cannot reach ``path``'s filesystem (r13 verdict #6). The
    maintenance plane (pyarrow.fs via operators/lakefs.py) speaks
    s3:// natively — proven against a live moto S3 server in
    tests/test_s3_object_store.py — but Spark scans need a Hadoop
    filesystem connector on the JVM classpath, which this sandbox does
    not ship (no hadoop-aws jar). Without this check the first probe
    scan over an s3:// index root dies in a raw Hadoop classpath
    stack. Real-cluster recipe: ARCHITECTURE.md §10 (hadoop-aws +
    aws-java-sdk-bundle on the classpath, fs.s3a.* session conf)."""
    from urllib.parse import urlparse

    scheme = urlparse(path).scheme
    if scheme in ("", "file"):
        return
    try:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        jvm.org.apache.hadoop.fs.FileSystem.get(
            jvm.java.net.URI.create(path), hconf
        )
    except Exception as e:
        raise RuntimeError(
            f"{what}: Spark's data plane has no filesystem connector "
            f"for scheme {scheme!r} ({path!r}). The maintenance plane "
            "(pyarrow.fs) supports this URI — see tests/"
            "test_s3_object_store.py — but Spark scans require the "
            "Hadoop connector (e.g. hadoop-aws + aws-java-sdk-bundle) "
            "plus fs.s3a.* conf on the session; recipe in "
            "ARCHITECTURE.md §10."
        ) from e


def resolve_index_root(path: str) -> str:
    """THE one resolution point every index open goes through: a
    pointer-layout root resolves to its live generation dir; a flat
    index resolves to itself. Returned in the caller's namespace, so
    Spark reads/writes address the same URI scheme the caller used."""
    from .lakefs import for_path

    lake, p = for_path(path)
    if lake.exists(f"{p}/{CURRENT_POINTER}"):
        gen = lake.read_text(f"{p}/{CURRENT_POINTER}").strip()
        if not gen.startswith(GEN_PREFIX) or "/" in gen or ".." in gen:
            raise ValueError(
                f"index at {path}: CURRENT pointer names an invalid "
                f"generation {gen!r} — expected a '{GEN_PREFIX}*' "
                "sibling directory name"
            )
        return f"{path}/{gen}"
    return path


def begin_generation_build(path: str) -> str:
    """A fresh generation dir for a pointer-mode build (base build or
    compaction fold). The name is final from the start — no rename on
    publish — but the generation is INVISIBLE until CURRENT names it,
    the same data-then-commit discipline as segment files."""
    import uuid

    from .lakefs import for_path

    lake, p = for_path(path)
    gen = f"{GEN_PREFIX}{uuid.uuid4().hex[:12]}"
    lake.mkdirs(f"{p}/{gen}")
    return f"{path}/{gen}"


def publish_generation(path: str, build: str, vacuum: bool = True) -> None:
    """Atomically flip CURRENT to a fully-built generation dir (the
    one-object PUT that replaces the flat layout's directory-rename
    swap), then — delete-after-commit — vacuum every generation the
    pointer no longer references. ``vacuum=False`` retains the
    superseded generations: snapshot pins still invalidate loudly on
    their generation token, but a reader whose SCAN is already in
    flight keeps its files until ``vacuum_generations`` reclaims them
    (the grace-period contract)."""
    import posixpath

    from .lakefs import for_path

    lake, p = for_path(path)
    gen = posixpath.basename(build.rstrip("/"))
    lake.write_text(f"{p}/{CURRENT_POINTER}", gen)
    if vacuum:
        vacuum_generations(path)


def vacuum_generations(path: str) -> int:
    """Delete every ``gen-*`` dir the CURRENT pointer does not
    reference — superseded generations retained by
    ``publish_generation(vacuum=False)`` and orphans from crashed
    builds (a crash before the flip leaves a complete-or-partial but
    UNREFERENCED generation; a crash after the flip leaves the old
    one). Returns how many were reclaimed. Run it like compaction —
    after in-flight readers of retained generations have drained."""
    import posixpath

    from .lakefs import for_path

    lake, p = for_path(path)
    current = None
    if lake.exists(f"{p}/{CURRENT_POINTER}"):
        current = lake.read_text(f"{p}/{CURRENT_POINTER}").strip()
    n = 0
    for entry in lake.listdir(p):
        if (
            entry.startswith(GEN_PREFIX)
            and entry != current
            and lake.isdir(f"{p}/{entry}")
        ):
            lake.rmtree(f"{p}/{entry}")
            n += 1
    return n
