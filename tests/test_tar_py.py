"""WebDataset-style tar shard reader tests (sources/tar_py.py):
member iteration, key/suffix naming rules, sample grouping contract,
compressed shards, chunked yields, and the 2 GiB cap pre-check."""

from __future__ import annotations

import io
import tarfile

import pytest

from datafusion_server_spark.sources import tar_py


def _tar_bytes(members: list[tuple[str, bytes]], mode: str = "w") -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode=mode) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def test_split_key_suffix_first_dot_rule():
    assert tar_py.split_key_suffix("dir/000123.seg.png") == ("dir/000123", "seg.png")
    assert tar_py.split_key_suffix("a.txt") == ("a", "txt")
    assert tar_py.split_key_suffix("nodot") == ("nodot", "")


def test_iter_members_plain_and_gzip():
    members = [("0001.txt", b"alpha"), ("0001.json", b"{}"), ("0002.txt", b"beta")]
    for mode in ("w", "w:gz"):
        rows = list(tar_py.iter_tar_members(_tar_bytes(members, mode), "s.tar"))
        assert [(r["member"], r["payload"]) for r in rows] == members
        assert [r["key"] for r in rows] == ["0001", "0001", "0002"]
        assert all(r["shard"] == "s.tar" for r in rows)


def test_read_webdataset_groups_adjacent_members(spark, tmp_path):
    p = tmp_path / "shard.tar"
    p.write_bytes(
        _tar_bytes(
            [
                ("0001.jpg", b"J1"),
                ("0001.txt", b"T1"),
                ("0002.jpg", b"J2"),  # txt member missing -> NULL column
                ("0003.txt", b"T3"),
                ("0003.jpg", b"J3"),
            ]
        )
    )
    out = tar_py.read_webdataset(spark, str(p), ("jpg", "txt"))
    rows = {r["key"]: r for r in out.collect()}
    assert bytes(rows["0001"]["c_jpg"]) == b"J1" and bytes(rows["0001"]["c_txt"]) == b"T1"
    assert bytes(rows["0002"]["c_jpg"]) == b"J2" and rows["0002"]["c_txt"] is None
    # order within a sample does not matter, adjacency does
    assert bytes(rows["0003"]["c_jpg"]) == b"J3"
    assert {r["n_members"] for r in rows.values()} == {2, 1, 2}


def test_read_webdataset_interleaved_keys_yield_visible_duplicates(spark, tmp_path):
    """A malformed shard that interleaves keys produces MULTIPLE rows
    for the key (downstream-visible), never silently merged/lost data."""
    p = tmp_path / "bad.tar"
    p.write_bytes(
        _tar_bytes(
            [("0001.jpg", b"J1"), ("0002.jpg", b"J2"), ("0001.txt", b"T1")]
        )
    )
    out = tar_py.read_webdataset(spark, str(p), ("jpg", "txt")).collect()
    keys = sorted(r["key"] for r in out)
    assert keys == ["0001", "0001", "0002"]


def test_read_tar_suffix_filter_and_chunking(spark, tmp_path):
    members = [(f"{i:04d}.txt", str(i).encode()) for i in range(23)] + [
        ("0000.skipme", b"x")
    ]
    p = tmp_path / "many.tar"
    p.write_bytes(_tar_bytes(members))
    # python-level chunker flushes every 5 records
    rows = tar_py.iter_tar_members(p.read_bytes(), "s")
    chunks = list(tar_py._chunked(rows, 5, 1 << 30))
    assert [len(c) for c in chunks] == [5, 5, 5, 5, 4]
    # spark-level: suffix pre-filter + chunked read == plain read
    out = tar_py.read_tar(spark, str(p), suffixes=("txt",), records_per_chunk=5)
    got = sorted(r["member"] for r in out.collect())
    assert len(got) == 23 and "0000.skipme" not in got


def test_oversized_shard_raises_clean_error(spark, tmp_path):
    big = tmp_path / "huge.tar"
    with open(big, "wb") as f:
        f.truncate((1 << 31) + 512)
    with pytest.raises(ValueError, match="2 GiB cap"):
        tar_py.read_tar(spark, str(big))
