"""SQL table functions (Python UDTFs) must agree row-for-row with the
function API — three entry points, one row contract."""

import pytest

import parquet_metadata_explorer_spark as pqx


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    pqx.register_udtfs(spark)


def _rows(df):
    return sorted(map(tuple, df.collect()), key=repr)


@pytest.mark.parametrize(
    "fn,source,level",
    [
        ("metadata_files", "file", "file"),
        ("metadata_parquet_file", "parquet", "file"),
        ("metadata_rowgroups", "parquet", "rowgroup"),
        ("metadata_columns", "parquet", "column"),
        ("metadata_pages", "parquet", "page"),
    ],
)
def test_udtf_matches_function_api(spark, sf_dir, fn, source, level):
    path = f"{sf_dir}/lineitem.parquet"
    via_sql = spark.sql(f"SELECT * FROM {fn}('{path}')")
    via_api = pqx.read_metadata(spark, path, source=source, level=level)
    assert via_sql.schema == via_api.schema
    assert _rows(via_sql) == _rows(via_api)


def test_lateral_over_listing(spark, sf_dir):
    """The scale form: per-file footer parses run inside the task owning
    each listing row."""
    files = pqx.read_metadata(spark, sf_dir, source="file", level="file")
    files.createOrReplaceTempView("t_files")
    out = spark.sql(
        "SELECT f.filepath, c.path, c.num_values "
        "FROM t_files f, LATERAL metadata_columns(f.filepath) c"
    )
    expected = pqx.read_metadata(spark, sf_dir, source="parquet", level="column")
    assert out.count() == expected.count()
    assert out.filter("num_values <= 0").count() == 0


def test_page_index_udtf(spark, tmp_path):
    """metadata_page_index matches read_page_index row-for-row on a file
    written with a page index."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "idx.parquet")
    pq.write_table(
        pa.table({"k": list(range(20000))}),
        p,
        data_page_size=4096,
        write_page_index=True,
    )
    via_sql = spark.sql(f"SELECT * FROM metadata_page_index('{p}')")
    via_api = pqx.read_page_index(spark, p)
    assert via_sql.schema == via_api.schema
    assert via_sql.count() == via_api.count() > 5
    assert _rows(via_sql) == _rows(via_api)


@pytest.fixture(scope="module")
def part_root_sql(tmp_path_factory):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path_factory.mktemp("udtf_pruned"))
    for d in ("2020-01-01", "2020-01-02"):
        for k in ("a", "b"):
            sub = f"{root}/date={d}/k={k}"
            os.makedirs(sub)
            pq.write_table(pa.table({"x": [1, 2]}), f"{sub}/part-0.parquet")
    bad = f"{root}/date=2020-01-03/k=a"
    os.makedirs(bad)
    with open(f"{bad}/part-0.parquet", "wb") as f:
        f.write(b"PAR1corrupt-not-a-footer")
    return root


def test_udtf_partition_filter_argument(spark, part_root_sql):
    """The optional second UDTF argument prunes partitions before any
    footer read: querying the whole root at parquet-file level succeeds
    from pure SQL even though an excluded partition holds a corrupt file."""
    rows = spark.sql(
        "SELECT filepath, partition['date'] AS d FROM "
        f"metadata_parquet_file('{part_root_sql}', 'date=2020-01-01|2020-01-02')"
    ).collect()
    assert len(rows) == 4
    assert {r.d for r in rows} == {"2020-01-01", "2020-01-02"}
