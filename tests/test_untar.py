"""S7 untar source: semantics pinned to the reference WDL
(UntarFiles.wdl:24-54) — scatter per tarball, flatten to basenames,
extension filter, loose-file landing."""

import io
import tarfile

from monster_etl_spark.sources.untar import untar_members, untar_to_dir


def _make_tar(path, members):
    with tarfile.open(path, "w") as tf:
        for name, data in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))


def test_untar_members_flatten_and_filter(spark, tmp_path):
    _make_tar(
        tmp_path / "a.tar",
        {"deep/nested/one.fastq": b"AAAA", "two.txt": b"tt", "deep/three.fastq": b"CGCG"},
    )
    _make_tar(tmp_path / "b.tar", {"other/four.fastq": b"GG"})
    out = untar_members(spark, f"{tmp_path}/*.tar", file_extension=".fastq")
    rows = {r["member"]: r for r in out.collect()}
    # flattened to basenames, .txt filtered out, both tarballs scattered
    assert set(rows) == {"one.fastq", "three.fastq", "four.fastq"}
    assert bytes(rows["one.fastq"]["content"]) == b"AAAA"
    assert rows["three.fastq"]["size"] == 4
    assert rows["four.fastq"]["tarball"].endswith("b.tar")


def test_untar_members_no_flatten_keeps_paths(spark, tmp_path):
    _make_tar(tmp_path / "a.tar", {"deep/one.bin": b"x"})
    out = untar_members(spark, f"{tmp_path}/*.tar", flatten=False)
    assert [r["member"] for r in out.collect()] == ["deep/one.bin"]


def test_untar_to_dir_lands_loose_files(spark, tmp_path):
    _make_tar(tmp_path / "a.tar", {"d/one.fastq": b"AA", "d/skip.txt": b"no"})
    dest = tmp_path / "landed"
    n = untar_to_dir(spark, f"{tmp_path}/a.tar", str(dest), file_extension=".fastq")
    assert n == 1
    assert (dest / "one.fastq").read_bytes() == b"AA"
    assert not (dest / "skip.txt").exists()
