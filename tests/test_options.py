"""Option parsing/validation parity (reference DefaultSourceSuite.scala:31-59)."""

import pytest

from parquet_metadata_explorer_spark.options import parse_options, validate_source_level


def test_invalid_source():
    with pytest.raises(ValueError, match="Invalid source: json"):
        validate_source_level("json", "file")


def test_invalid_level():
    with pytest.raises(ValueError, match="Invalid level: pages"):
        validate_source_level("parquet", "pages")


@pytest.mark.parametrize("level", ["rowgroup", "column", "page"])
def test_file_source_rejects_parquet_levels(level):
    with pytest.raises(ValueError, match=f"Source 'file' does not support '{level}' level"):
        validate_source_level("file", level)


def test_parquet_supports_all_levels():
    for level in ("file", "rowgroup", "column", "page"):
        validate_source_level("parquet", level)


def test_defaults():
    opts = parse_options({"path": "/tmp/x"})
    assert opts.maxparts == 200
    assert opts.buffersize == 128 * 1024 * 1024
    assert opts.pagecontent is False
    assert opts.level == "file"
    assert opts.source is None


def test_path_required():
    with pytest.raises(ValueError, match="Option 'path' is required"):
        parse_options({})


def test_invalid_maxparts_and_buffersize():
    with pytest.raises(ValueError, match="Invalid value for maxparts"):
        parse_options({"path": "/tmp/x", "maxparts": "0"})
    with pytest.raises(ValueError, match="Invalid value for buffersize"):
        parse_options({"path": "/tmp/x", "buffersize": "-1"})


def test_case_insensitive_options():
    opts = parse_options({"path": "/tmp/x", "LEVEL": "Column", "Source": "PARQUET"})
    assert opts.level == "column"
    assert opts.source == "parquet"
