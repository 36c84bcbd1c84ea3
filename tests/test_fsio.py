"""HadoopFS adapter: the maintenance-path filesystem operations the epoch
sinks and table-maintenance jobs build their commit protocols on. Local
paths and file: URIs must behave identically (same code path a DFS
deployment uses, scheme-resolved)."""

from __future__ import annotations

import os

import pytest

from sport_data_pipeline_spark.fsio import HadoopFS, join


def test_join_is_uri_safe():
    assert join("/a/b", "c") == "/a/b/c"
    assert join("/a/b/", "c") == "/a/b/c"
    assert join("hdfs://nn:8020/t", "p=1") == "hdfs://nn:8020/t/p=1"
    assert join("file:///a/", "x") == "file:///a/x"


@pytest.mark.parametrize("scheme", ["", "file://"])
def test_roundtrip_ops(spark, tmp_path, scheme):
    base = scheme + str(tmp_path)
    fs = HadoopFS(spark, base)

    assert fs.exists(base) and fs.is_dir(base)
    assert not fs.exists(join(base, "missing"))
    assert fs.listdir(join(base, "missing")) == []
    fs.delete(join(base, "missing"))  # no-op, no raise

    fs.mkdirs(join(base, "d1/d2"))
    assert fs.is_dir(join(base, "d1/d2"))

    # atomic small-file publish: write tmp + rename
    fs.write_text(join(base, "m.tmp"), "42")
    fs.rename(join(base, "m.tmp"), join(base, "m"))
    assert not fs.exists(join(base, "m.tmp"))
    assert fs.read_text(join(base, "m")) == "42"
    assert not fs.is_dir(join(base, "m"))

    # overwrite semantics of write_text
    fs.write_text(join(base, "m2"), "a")
    fs.write_text(join(base, "m2"), "bb")
    assert fs.read_text(join(base, "m2")) == "bb"

    # recursive listing: names + lengths, directories walked
    fs.write_text(join(base, "d1/d2/f1"), "xyz")
    got = dict(fs.files(base))
    assert got["f1"] == 3 and got["m"] == 2 and got["m2"] == 2
    assert fs.files(join(base, "nope")) == []

    # recursive delete
    fs.delete(join(base, "d1"))
    assert not fs.exists(join(base, "d1"))

    # rename refuses loudly instead of returning False silently
    with pytest.raises(IOError):
        fs.rename(join(base, "absent"), join(base, "anywhere"))


def test_local_writes_visible_to_python_os(spark, tmp_path):
    # local-mode sanity: the adapter manipulates the same files os sees
    base = str(tmp_path)
    fs = HadoopFS(spark, base)
    fs.write_text(join(base, "f"), "hello")
    assert open(os.path.join(base, "f")).read() == "hello"
