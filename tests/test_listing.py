"""Listing unit tests: partition parsing, hidden-file filtering, and the
distributed-listing path (exercised by lowering the width threshold)."""

import os

from parquet_metadata_explorer_spark.listing import (
    list_files,
    parse_partition_values,
)


def test_parse_partition_values():
    assert parse_partition_values("/r", "/r/a=1/b=x%20y/f.parquet") == (
        ("a", "1"),
        ("b", "x y"),
    )
    assert parse_partition_values("/r", "/r/f.parquet") == ()
    assert parse_partition_values("/r", "/r/p=__HIVE_DEFAULT_PARTITION__/f.parquet") == (
        ("p", None),
    )


def _mktree(root):
    for d in range(4):
        sub = os.path.join(root, f"k={d}")
        os.makedirs(sub)
        for i in range(3):
            with open(os.path.join(sub, f"f{i}.bin"), "wb") as f:
                f.write(b"x" * (d * 10 + i + 1))
        with open(os.path.join(sub, "_hidden"), "w") as f:
            f.write("skip me")
    with open(os.path.join(root, ".dotfile"), "w") as f:
        f.write("skip me too")


def test_driver_side_listing(tmp_path):
    root = str(tmp_path / "tree")
    os.makedirs(root)
    _mktree(root)
    files = list_files(root)
    assert len(files) == 12
    assert all(not f.name.startswith(("_", ".")) for f in files)
    assert {f.partition_map()["k"] for f in files} == {"0", "1", "2", "3"}
    assert files == sorted(files, key=lambda f: f.path)


def test_distributed_listing_matches_driver_side(spark, tmp_path):
    root = str(tmp_path / "tree2")
    os.makedirs(root)
    _mktree(root)
    serial = list_files(root)
    distributed = list_files(
        root, spark=spark, distributed_threshold=2, spark_threshold=2
    )
    assert [(f.path, f.size, f.partition) for f in distributed] == [
        (f.path, f.size, f.partition) for f in serial
    ]


def test_threadpool_listing_matches_driver_side(tmp_path):
    # the no-SparkSession wide-root path (what format("metadata") hits)
    root = str(tmp_path / "tree3")
    os.makedirs(root)
    _mktree(root)
    serial = list_files(root)
    pooled = list_files(root, spark=None, distributed_threshold=2)
    assert [(f.path, f.size, f.partition) for f in pooled] == [
        (f.path, f.size, f.partition) for f in serial
    ]


def test_format_path_wide_root_equivalence(spark, tmp_path):
    """format("metadata") and read_metadata() agree on a root wide enough
    to trip the parallel-listing branch (>=64 first-level dirs)."""
    import parquet_metadata_explorer_spark as pqx

    pqx.register(spark)
    root = str(tmp_path / "wide")
    os.makedirs(root)
    for d in range(70):
        sub = os.path.join(root, f"k={d}")
        os.makedirs(sub)
        with open(os.path.join(sub, "f0.bin"), "wb") as f:
            f.write(b"x" * (d + 1))
    via_format = (
        spark.read.format("metadata")
        .option("source", "file")
        .option("level", "file")
        .load(root)
        .orderBy("filepath")
        .collect()
    )
    via_func = (
        pqx.read_metadata(spark, root, source="file", level="file")
        .orderBy("filepath")
        .collect()
    )
    assert len(via_format) == 70
    assert [(r.filepath, r.size, r.partition) for r in via_format] == [
        (r.filepath, r.size, r.partition) for r in via_func
    ]


def test_glob_patterns(spark, sf_dir, tmp_path):
    """Globs expand per segment (never crossing /): file patterns, dir
    patterns with partition discovery beneath the match, and no-match
    errors."""
    import pytest

    import parquet_metadata_explorer_spark as pqx
    from parquet_metadata_explorer_spark.listing import list_files

    # file-level glob over the testdata directory
    files = list_files(f"{sf_dir}/l*.parquet")
    assert [f.name for f in files] == ["lineitem.parquet"]

    # glob selecting multiple files
    names = {f.name for f in list_files(f"{sf_dir}/*a*.parquet")}
    assert names == {"nation.parquet", "part.parquet"}

    # dir glob + partition discovery under the matched root
    df = spark.createDataFrame([(1, "a"), (2, "b")], "v long, part string")
    for sub in ("ds_one", "ds_two", "other"):
        df.write.mode("overwrite").partitionBy("part").parquet(str(tmp_path / sub))
    fis = list_files(str(tmp_path / "ds_*"))
    assert len(fis) > 0
    parts = {dict(f.partition).get("part") for f in fis}
    assert parts == {"a", "b"}
    assert not any("/other/" in f.path for f in fis)

    # end-to-end through the reader API
    assert pqx.read_metadata(spark, f"{sf_dir}/l*.parquet", level="rowgroup").count() == 1

    with pytest.raises(FileNotFoundError, match="does not exist"):
        list_files(f"{sf_dir}/zzz*.parquet")


def test_glob_recursion_keeps_uri_scheme(tmp_path, monkeypatch):
    """Glob matches recurse with the original URI scheme re-prefixed —
    scheme-less recursion would silently re-resolve s3://... globs
    against the local filesystem (ADVICE r3)."""
    import parquet_metadata_explorer_spark.listing as L

    root = str(tmp_path / "g")
    for d in ("d1", "d2"):
        os.makedirs(os.path.join(root, d))
        with open(os.path.join(root, d, "f.bin"), "wb") as f:
            f.write(b"x")

    seen = []
    orig = L.resolve_filesystem

    def spy(path):
        seen.append(path)
        return orig(path)

    monkeypatch.setattr(L, "resolve_filesystem", spy)
    files = L.list_files(f"file://{root}/d*")
    assert len(files) == 2
    # every resolve (the glob root AND each per-match recursion) must
    # carry the scheme so the same filesystem is re-selected
    assert seen and all(p.startswith("file://") for p in seen)


def test_wide_root_routing_defaults(spark, tmp_path, monkeypatch):
    """Measured routing defaults (tools/listing_probe.py): a wide root
    below spark_threshold uses the driver THREAD pool even when a
    SparkSession is available (a local Spark job pays ~2.4 s fixed
    scheduling overhead); only spark_threshold-wide roots take the
    distributed job, where cluster cores amortize it."""
    import parquet_metadata_explorer_spark.listing as L

    root = tmp_path / "wide"
    for d in range(70):  # >= distributed_threshold, < spark_threshold
        sub = root / f"k={d}"
        sub.mkdir(parents=True)
        (sub / "f.bin").write_bytes(b"x")

    used = {"threads": False, "spark": False}
    orig_make = L._make_list_dir

    def spy_make(uri_prefix, fs_snapshot=None):
        inner = orig_make(uri_prefix, fs_snapshot)

        def spy(d):
            import threading

            if threading.current_thread().name != "MainThread":
                used["threads"] = True
            return inner(d)

        return spy

    monkeypatch.setattr(L, "_make_list_dir", spy_make)
    files = L.list_files(str(root), spark=spark)  # defaults
    assert len(files) == 70
    assert used["threads"], "wide-but-not-huge root must use the thread pool"

    # forcing the spark threshold down routes the same root to the job
    files2 = L.list_files(str(root), spark=spark, spark_threshold=64)
    assert [(f.path, f.size) for f in files2] == [(f.path, f.size) for f in files]
