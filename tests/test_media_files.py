"""K4 media file sink: distributed blob→file writes (reference analog:
store/xhs/xhs_store_image.py data/xhs/images/<notice_id>/<name>)."""

import os

from mediacrawler_spark.operators.media import MEDIA_SCHEMA
from mediacrawler_spark.sinks.media_files import write_media_files


def _media_df(spark):
    rows = [
        ("https://cdn.example.test/img/n0001-0", "image", b"\x89PNGfake0"),
        ("https://cdn.example.test/img/n0001-1", "image", b"\x89PNGfake1x"),
        ("https://cdn.example.test/video/n0002", "video", b"\x00\x01\x02" * 10),
        ("https://cdn.example.test/img/n0003-0", "image", None),  # missing blob
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_write_media_files_contents_and_manifest(spark, tmp_path):
    root = str(tmp_path / "media")
    manifest = {
        r["media_ref"]: (r["path"], r["n_bytes"])
        for r in write_media_files(_media_df(spark), root).collect()
    }
    assert len(manifest) == 4
    for ref, (path, n) in manifest.items():
        assert os.path.isfile(path), path
        assert os.path.getsize(path) == n
        assert path.startswith(root)
    # grouped by media_type by default (images/, videos/)
    assert "/images/" in manifest["https://cdn.example.test/video/n0002"][0].replace(
        "/videos/", "/images/"
    )
    assert "/videos/" in manifest["https://cdn.example.test/video/n0002"][0]
    # byte-exact content round trip
    p, n = manifest["https://cdn.example.test/img/n0001-1"]
    assert open(p, "rb").read() == b"\x89PNGfake1x"
    # NULL data → empty file, ref still in the manifest
    p0, n0 = manifest["https://cdn.example.test/img/n0003-0"]
    assert n0 == 0 and os.path.getsize(p0) == 0


def test_write_media_files_idempotent_and_grouped(spark, tmp_path):
    root = str(tmp_path / "media2")
    df = _media_df(spark)
    first = sorted(r["path"] for r in write_media_files(df, root).collect())
    second = sorted(r["path"] for r in write_media_files(df, root).collect())
    assert first == second  # pure function of (subdir, ref): rerun overwrites
    # reference-style grouping by item id via subdir_col
    by_type = write_media_files(df, root, subdir_col="media_type").collect()
    assert all("/image/" in r["path"] or "/video/" in r["path"] for r in by_type)


def test_refs_differing_only_in_sanitized_chars_get_distinct_paths(spark, tmp_path):
    """ADVICE r03: 'a/b' and 'a_b' sanitize identically; the md5 suffix
    must keep their paths distinct so neither blob overwrites the other."""
    root = str(tmp_path / "media3")
    rows = [
        ("ref/a/b", "image", b"first"),
        ("ref/a_b", "image", b"second"),
        ("x" * 300 + "tail", "image", b"long-a"),   # shared 120-char tail
        ("y" * 300 + ("x" * 200 + "tail")[-120:], "image", b"long-b"),
    ]
    manifest = {
        r["media_ref"]: r["path"]
        for r in write_media_files(
            spark.createDataFrame(rows, MEDIA_SCHEMA), root
        ).collect()
    }
    assert len(set(manifest.values())) == 4
    assert open(manifest["ref/a/b"], "rb").read() == b"first"
    assert open(manifest["ref/a_b"], "rb").read() == b"second"
