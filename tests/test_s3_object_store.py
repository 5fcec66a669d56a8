"""Maintenance-plane semantics OBSERVED against a real S3 API (r12
verdict #5).

The lakefs shim's S3 contract (atomic single-object publish,
list-after-write visibility, no rename, per-key deletes — see the
module docstring of operators/lakefs.py) was until now asserted from
the S3 documentation and exercised only through the rename-incapable
LocalFileSystem seam. This suite drives the SAME shim methods and the
pointer-generation machinery against moto's S3 server over
``pyarrow.fs.S3FileSystem`` — a real S3 wire protocol with S3's
namespace model (no directories, prefix listing, multipart PUT).

Scope note (recorded in ARCHITECTURE.md §10): only the MAINTENANCE
plane runs here. The Spark DATA plane (parquet segment reads/writes)
cannot be driven against s3:// offline — this Spark distribution
ships no hadoop-aws connector and the sandbox cannot fetch one — and
its object-store story is Spark's own connector, not this repo's
code; every maintenance-plane byte that CAN go through our code does
go through it in this suite.

One emulator patch: moto serializes CompleteMultipartUpload's 200
body with root tag ``CompleteMultipartUploadResponse`` where AWS (and
the AWS C++ SDK parser inside pyarrow) use
``CompleteMultipartUploadResult``; the fixture rewrites the tag so
pyarrow's writer — which publishes every object through multipart —
can complete. The patch touches only the emulator's response text,
never the code under test.
"""

import socket

import pytest

moto = pytest.importorskip("moto")

BUCKET = "pqx-test-bucket"


@pytest.fixture(scope="module")
def s3():
    """A live moto S3 server + the Lake handle over pyarrow's real
    S3FileSystem. Yields (lake, base) with base = '<bucket>' in the
    filesystem's own namespace."""
    from moto.core.responses import BaseResponse
    from moto.server import ThreadedMotoServer
    from pyarrow import fs as pafs

    from parquet_metadata_explorer_spark.operators.lakefs import Lake

    orig = BaseResponse.serialized

    def patched(self, action_result):
        status, headers, body = orig(self, action_result)
        if isinstance(body, str):
            body = body.replace(
                "CompleteMultipartUploadResponse",
                "CompleteMultipartUploadResult",
            )
        elif isinstance(body, (bytes, bytearray)):
            body = body.replace(
                b"CompleteMultipartUploadResponse",
                b"CompleteMultipartUploadResult",
            )
        return status, headers, body

    BaseResponse.serialized = patched
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    server = ThreadedMotoServer(ip_address="127.0.0.1", port=port,
                                verbose=False)
    server.start()
    try:
        fs = pafs.S3FileSystem(
            access_key="testing",
            secret_key="testing",
            endpoint_override=f"http://127.0.0.1:{port}",
            region="us-east-1",
            allow_bucket_creation=True,
            allow_bucket_deletion=True,
        )
        fs.create_dir(BUCKET, recursive=True)
        yield Lake(fs), BUCKET
    finally:
        server.stop()
        BaseResponse.serialized = orig


def test_capability_detection(s3):
    """pyarrow's S3FileSystem must auto-detect as rename-INCAPABLE —
    the conservative default every swap caller relies on."""
    lake, _ = s3
    assert lake.rename_capable is False


def test_atomic_publish_and_list_after_write(s3):
    """write_bytes publishes all-or-nothing (the object appears only
    at multipart-complete time) and is immediately visible to both
    point reads and prefix listings — the two consistency properties
    commit files and CURRENT pointers rely on."""
    lake, b = s3
    lake.write_bytes(f"{b}/pub/one.bin", b"v1")
    assert lake.listdir(f"{b}/pub") == ["one.bin"]
    assert lake.read_text(f"{b}/pub/one.bin") == "v1"
    # overwrite is the CURRENT-flip primitive: read-after-overwrite
    # must return the new object, never a partial mix
    lake.write_bytes(f"{b}/pub/one.bin", b"v2-longer-content")
    assert lake.read_text(f"{b}/pub/one.bin") == "v2-longer-content"


def test_table_roundtrip(s3):
    """Sidecar parquet write/read through the shim round-trips on S3."""
    import pyarrow as pa

    lake, b = s3
    t = pa.table({"cell": [0, 1, 2], "w": [0.5, 1.5, 2.5]})
    lake.write_table(t, f"{b}/side/part-00000.parquet")
    got = lake.read_table(f"{b}/side/part-00000.parquet")
    assert got.equals(t)


def test_move_refuses(s3):
    """Directory/file rename must refuse loudly — a copy+delete
    fallback would break the swap's crash contract."""
    from parquet_metadata_explorer_spark.operators.lakefs import (
        UnsupportedOperation,
    )

    lake, b = s3
    lake.write_bytes(f"{b}/mv/a.bin", b"x")
    with pytest.raises(UnsupportedOperation, match="no atomic rename"):
        lake.move(f"{b}/mv/a.bin", f"{b}/mv/b.bin")
    assert lake.read_text(f"{b}/mv/a.bin") == "x"  # source untouched


def test_narrowed_delete_semantics(s3):
    """rmtree/rmfile: silent on positively-missing paths, effective on
    real prefixes — S3's flat namespace included (deleting a 'dir'
    deletes every key under the prefix)."""
    lake, b = s3
    lake.rmfile(f"{b}/del/never-existed.bin")
    lake.rmtree(f"{b}/del/never-existed-dir")
    lake.write_bytes(f"{b}/del/tree/x.bin", b"1")
    lake.write_bytes(f"{b}/del/tree/sub/y.bin", b"2")
    lake.rmtree(f"{b}/del/tree")
    assert not lake.exists(f"{b}/del/tree/x.bin")
    assert not lake.exists(f"{b}/del/tree/sub/y.bin")
    lake.write_bytes(f"{b}/del/solo.bin", b"3")
    lake.rmfile(f"{b}/del/solo.bin")
    assert not lake.exists(f"{b}/del/solo.bin")


def test_transient_delete_failures_propagate():
    """The r13 narrowing's OTHER half: rmtree/rmfile stay silent only
    when the store POSITIVELY reports the path absent — a transient
    failure (network blip surfacing as a bare OSError while the path
    still exists) must propagate, never masquerade as 'already gone'
    (a vacuum that silently skips a retired generation, a
    forget_pending marker that silently survives)."""
    from pyarrow import fs as pafs

    from parquet_metadata_explorer_spark.operators.lakefs import Lake

    class FlakyFS:
        """delete_* always raises a bare OSError; get_file_info says
        the path EXISTS — the transient-failure signature."""

        def delete_dir(self, path):
            raise OSError("connection reset by peer")

        def delete_file(self, path):
            raise OSError("connection reset by peer")

        def get_file_info(self, path):
            info = type("I", (), {})()
            info.type = pafs.FileType.File
            return info

    lake = Lake(FlakyFS(), rename_capable=False)
    with pytest.raises(OSError, match="connection reset"):
        lake.rmtree("bucket/ix/gen-old")
    with pytest.raises(OSError, match="connection reset"):
        lake.rmfile("bucket/ix/forget_pending")

    class GoneFS(FlakyFS):
        """delete_* raises a bare OSError but the store reports the
        path ABSENT — a benign race, stays silent."""

        def get_file_info(self, path):
            info = type("I", (), {})()
            info.type = pafs.FileType.NotFound
            return info

    lake2 = Lake(GoneFS(), rename_capable=False)
    lake2.rmtree("bucket/ix/gen-old")
    lake2.rmfile("bucket/ix/forget_pending")


def test_pointer_generation_lifecycle_on_s3(s3, monkeypatch):
    """The pointer-generation machinery end-to-end on the real S3
    namespace: build → CURRENT flip → resolve; second build with
    vacuum=False retains the superseded generation (grace period);
    vacuum_generations reclaims exactly it; the GENERATION token
    round-trips; a tampered CURRENT still fails loudly."""
    from parquet_metadata_explorer_spark.operators import (
        lakefs as lakefs_mod,
    )
    from parquet_metadata_explorer_spark.operators import segments

    lake, b = s3
    monkeypatch.setattr(
        lakefs_mod,
        "_TEST_FS_FACTORY",
        lambda p: (lake, p) if p.startswith(BUCKET + "/") else (None, p),
    )
    root = f"{b}/ix"

    g1 = segments.begin_generation_build(root)
    lake.write_bytes(f"{g1}/sidecar.bin", b"gen1")
    segments.publish_generation(root, g1)
    assert segments.pointer_layout(root)
    assert segments.resolve_index_root(root) == g1
    assert lake.read_text(f"{segments.resolve_index_root(root)}/sidecar.bin") == "gen1"

    g2 = segments.begin_generation_build(root)
    lake.write_bytes(f"{g2}/sidecar.bin", b"gen2")
    segments.publish_generation(root, g2, vacuum=False)
    gens = sorted(e for e in lake.listdir(root) if e.startswith("gen-"))
    assert len(gens) == 2  # superseded generation retained
    assert segments.resolve_index_root(root) == g2
    # the retained generation's files are still readable (the
    # grace-period property an in-flight scan depends on)
    assert lake.read_text(f"{g1}/sidecar.bin") == "gen1"

    assert segments.vacuum_generations(root) == 1
    gens = sorted(e for e in lake.listdir(root) if e.startswith("gen-"))
    assert len(gens) == 1 and g2.endswith(gens[0])
    assert not lake.exists(f"{g1}/sidecar.bin")

    tok = segments.mint_generation(root)
    assert segments.read_generation(root) == tok

    lake.write_bytes(f"{root}/CURRENT", b"../../etc")
    with pytest.raises(ValueError, match="invalid generation"):
        segments.resolve_index_root(root)

def test_spark_data_plane_capability_error(spark):
    """r13 verdict #6: a probe pointed at an s3:// index root must fail
    with ONE capability error naming the maintenance-plane coverage and
    the cluster recipe — not a raw Hadoop classpath stack (no hadoop-aws
    jar ships in this sandbox). The check fires BEFORE any maintenance
    I/O, so no credentials or server are needed here."""
    import pytest as _pytest

    from parquet_metadata_explorer_spark.operators.fsck import (
        bm25_index_verify,
    )
    from parquet_metadata_explorer_spark.operators.segments import (
        ensure_spark_data_plane,
    )
    from parquet_metadata_explorer_spark.operators.similarity import (
        ivfpq_probe_topk,
    )
    from parquet_metadata_explorer_spark.operators.text import (
        bm25_probe_topk,
    )

    with _pytest.raises(RuntimeError, match="ARCHITECTURE.md"):
        ensure_spark_data_plane(spark, "s3://bucket/idx", "unit")
    # local paths pass untouched
    ensure_spark_data_plane(spark, "/tmp/anything", "unit")
    ensure_spark_data_plane(spark, "file:///tmp/anything", "unit")

    for fn in (
        lambda: bm25_probe_topk(spark, "s3://b/i", [(1, "x")], k=1),
        lambda: ivfpq_probe_topk(
            spark, "s3://b/i",
            spark.createDataFrame([(1, [0.0])], "vec_id long, embedding array<double>"),
        ),
        lambda: bm25_index_verify(spark, "s3://b/i"),
    ):
        with _pytest.raises(RuntimeError, match="no filesystem connector"):
            fn()
