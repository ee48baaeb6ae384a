"""WebDataset TAR-shard source (sources/webdataset.py): deterministic
encode, basename-grouping semantics, multi-dot extensions, distributed
read."""

from postgres_debezium_clickhouse_spark.sources.webdataset import (
    read_webdataset,
    webdataset_encode_shard,
)


def _shard():
    return webdataset_encode_shard([
        {"key": "7", "files": {"txt": b"hello", "json": b'{"a":1}'}},
        {"key": "a.b", "files": {"jpg": b"\xff\xd8"}},
    ])


def test_encode_is_deterministic_and_sorted():
    assert _shard() == _shard()  # mtime pinned → byte-identical shards
    import io
    import tarfile

    names = [m.name for m in tarfile.open(fileobj=io.BytesIO(_shard()))]
    assert names == ["7.json", "7.txt", "a.b.jpg"]  # adjacent, ext-sorted


def test_read_groups_by_first_dot(spark, tmp_path):
    (tmp_path / "s0.tar").write_bytes(_shard())
    rows = read_webdataset(spark, str(tmp_path)).collect()
    by = {(r.sample_key, r.ext): bytes(r.content) for r in rows}
    assert by[("7", "txt")] == b"hello"
    assert by[("7", "json")] == b'{"a":1}'
    # WebDataset rule: key = basename up to the FIRST dot
    assert by[("a", "b.jpg")] == b"\xff\xd8"
    assert len(rows) == 3
