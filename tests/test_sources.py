"""Source/sink round-trips + the reference O13 text sink shape."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from mapreducewordcounting_spark.catalog import load_table
from mapreducewordcounting_spark.operators.wordcount import word_count
from mapreducewordcounting_spark.sources import (
    read_table,
    read_text_corpus,
    write_table,
    write_wordcount_text,
)

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".scratch")


@pytest.fixture()
def scratch(request):
    d = os.path.join(SCRATCH, request.node.name.replace("[", "_").replace("]", ""))
    # brackets are glob chars to Spark's path resolution
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _wordcount_lines(path):
    lines = []
    per_file = {}
    for fn in sorted(os.listdir(path)):
        if fn.startswith(("part-", "part_")) and not fn.endswith(".crc"):
            with open(os.path.join(path, fn)) as f:
                fl = [ln.rstrip("\n") for ln in f if ln.strip()]
            per_file[fn] = fl
            lines.extend(fl)
    return lines, per_file


def test_wordcount_text_sink_reference_shape(spark, sf_dir, scratch):
    """O13 fidelity: 'word count' lines, each output file sorted."""
    wc = word_count(spark, sf_dir)
    out = os.path.join(scratch, "wc")
    write_wordcount_text(wc, out)
    lines, per_file = _wordcount_lines(out)
    expected = {f"{r.word} {r.cnt}" for r in wc.collect()}
    assert set(lines) == expected
    for fn, fl in per_file.items():
        assert fl == sorted(fl), f"{fn} not sorted (reference O12 order)"


def test_wordcount_text_sink_merged(spark, sf_dir, scratch):
    """README.md:11 TODO — one merged output file via coalesce(1)."""
    wc = word_count(spark, sf_dir)
    out = os.path.join(scratch, "wc1")
    write_wordcount_text(wc, out, merge=True)
    _, per_file = _wordcount_lines(out)
    assert len(per_file) == 1
    (only,) = per_file.values()
    assert only == sorted(only)


def test_text_corpus_source(spark, sf_dir, scratch):
    """Directory-of-text-files source (the reference's input mode)."""
    corpus = os.path.join(scratch, "corpus")
    os.makedirs(corpus)
    for i, content in enumerate(["hello world", "hello spark\nhello again"]):
        with open(os.path.join(corpus, f"f{i}.txt"), "w") as f:
            f.write(content)
    df = read_text_corpus(spark, corpus)
    rows = df.collect()
    assert len(rows) == 3  # one per line
    assert {os.path.basename(r.file.replace("file://", "")) for r in rows} == {
        "f0.txt", "f1.txt"}
    counts = (
        df.select(F.explode(F.split("text", r"\s+")).alias("word"))
        .groupBy("word").count().collect())
    assert {(r.word, r["count"]) for r in counts} == {
        ("hello", 3), ("world", 1), ("spark", 1), ("again", 1)}


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip_formats(spark, sf_dir, scratch, fmt):
    src = load_table(spark, sf_dir, "nation")
    path = os.path.join(scratch, fmt)
    write_table(src, path, fmt=fmt, header="true")
    back = read_table(spark, path, fmt=fmt,
                      schema=src.schema if fmt in ("csv", "json") else None)
    assert sorted(map(tuple, src.collect())) == sorted(map(tuple, back.collect()))


def test_parquet_codec_roundtrip(spark, sf_dir, scratch):
    """Columnar compression codecs (zstd) round-trip losslessly."""
    src = load_table(spark, sf_dir, "nation")
    path = os.path.join(scratch, "zstd")
    write_table(src, path, fmt="parquet", compression="zstd")
    back = read_table(spark, path)
    assert sorted(map(tuple, src.collect())) == sorted(map(tuple, back.collect()))
    import glob
    assert any("zstd" in f for f in glob.glob(os.path.join(path, "*.parquet")))


def test_partitioned_write_prunes(spark, sf_dir, scratch):
    """Hive-partitioned write → re-read with a partition filter reads
    only that partition's directory."""
    src = load_table(spark, sf_dir, "customer")
    path = os.path.join(scratch, "part_by_seg")
    write_table(src, path, fmt="parquet", partition_by=("c_mktsegment",))
    segs = [d for d in os.listdir(path) if d.startswith("c_mktsegment=")]
    assert len(segs) >= 2
    back = read_table(spark, path).filter(F.col("c_mktsegment") == "MACHINERY")
    expected = src.filter(F.col("c_mktsegment") == "MACHINERY").count()
    assert back.count() == expected
    # partition pruning visible in the plan
    from mapreducewordcounting_spark.plans import formatted_plan
    assert "PartitionFilters" in formatted_plan(back)


def test_training_shards_layout(spark, sf_dir, scratch):
    """Pipeline output → partitioned, size-capped shards, readable back
    with partition pruning."""
    from mapreducewordcounting_spark.catalog import load_table
    from mapreducewordcounting_spark.sources import write_training_shards

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text")
    out = os.path.join(scratch, "shards")
    write_training_shards(docs, out, max_records_per_file=100)
    langs = [d for d in os.listdir(out) if d.startswith("lang=")]
    assert len(langs) >= 2
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # per-file cap honored
    import glob
    for f in glob.glob(os.path.join(out, "lang=*", "*.parquet")):
        n = spark.read.parquet(f).count()
        assert n <= 100, f


def test_pyds_writer_two_phase_commit(tmp_path):
    """White-box: task shards become visible only through commit's
    manifest; abort removes the orphan shard files."""
    import json
    import os
    from types import SimpleNamespace

    from mapreducewordcounting_spark.sources.pyds import DocCorpusWriter

    out = str(tmp_path / "sink")
    w = DocCorpusWriter({"path": out})
    rows = [SimpleNamespace(doc_id=i, text=f"doc {i}") for i in range(5)]
    m1 = w.write(iter(rows[:3]))
    m2 = w.write(iter(rows[3:]))
    assert {m1.n_rows, m2.n_rows} == {3, 2}
    # pre-commit: shards exist but no manifest — readers see nothing
    assert not os.path.exists(os.path.join(out, "_MANIFEST.json"))
    w.commit([m1, m2])
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == 5
    assert sorted(manifest["shards"]) == manifest["shards"]
    # abort path: a failed attempt's shard is removed
    m3 = w.write(iter(rows[:1]))
    w.abort([m3, None])
    assert not os.path.exists(os.path.join(out, m3.filename))


def test_pyds_writer_append_merges_and_overwrite_clears(tmp_path):
    """append: a second job's commit merges the prior manifest (earlier
    data stays visible); overwrite: prior shards + manifest are cleared;
    a task dying mid-write leaves only an invisible .tmp."""
    import json
    import os
    from types import SimpleNamespace

    from mapreducewordcounting_spark.sources.pyds import DocCorpusWriter

    out = str(tmp_path / "sink")
    rows = [SimpleNamespace(doc_id=i, text=f"d{i}") for i in range(4)]

    w1 = DocCorpusWriter({"path": out})
    w1.commit([w1.write(iter(rows[:2]))])
    w2 = DocCorpusWriter({"path": out})          # append job
    w2.commit([w2.write(iter(rows[2:]))])
    m = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert m["total_rows"] == 4 and len(m["shards"]) == 2

    w3 = DocCorpusWriter({"path": out}, overwrite=True)
    w3.commit([w3.write(iter(rows[:1]))])
    m = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert m["total_rows"] == 1 and len(m["shards"]) == 1
    on_disk = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert sorted(on_disk) == m["shards"]

    # simulated mid-write death: iterator raises after the file opens
    def dying():
        yield rows[0]
        raise RuntimeError("task died")
    w4 = DocCorpusWriter({"path": out})
    try:
        w4.write(dying())
    except RuntimeError:
        pass
    jsonl = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert sorted(jsonl) == m["shards"]  # no partial shard became visible
