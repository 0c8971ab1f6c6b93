"""S1-S3/S5 source+sink tests over the committed golden corpus
(FIXTURES.md §B): the reference's native job end-to-end."""

from __future__ import annotations

import os

from mapreducer_spark.sources.text_corpus import (
    read_kv_lines,
    read_text_dir,
    word_count_text_dir,
    write_kv_lines,
)

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "fixtures", "text")


def test_word_count_text_dir_golden(spark):
    got = [(r.word, r.cnt) for r in word_count_text_dir(spark, FIXTURE_DIR).collect()]
    # Hand-computed over a.txt + b.txt (lowercased, [^a-z0-9]+ splits,
    # sorted by code point — digits before letters, mirroring wcscmp).
    golden = [
        ("42", 2),
        ("9", 1),
        ("a", 1),
        ("again", 2),
        ("and", 2),
        ("at", 1),
        ("brown", 1),
        ("dawn", 1),
        ("dog", 3),
        ("fox", 2),
        ("hours", 1),
        ("in", 1),
        ("jumps", 1),
        ("lazy", 1),
        ("map", 3),
        ("met", 1),
        ("nine", 1),
        ("noise", 1),
        ("over", 1),
        ("quick", 1),
        ("reduce", 3),
        ("saves", 1),
        ("sleeps", 1),
        ("stitch", 1),
        ("territory", 1),
        ("the", 7),
        ("then", 1),
        ("time", 1),
        ("times", 1),
    ]
    assert got == golden


def test_kv_sink_roundtrip(spark, tmp_path):
    wc = word_count_text_dir(spark, FIXTURE_DIR)
    out = str(tmp_path / "kv_out")
    write_kv_lines(wc, out)
    back = read_kv_lines(spark, out)
    orig = {(r.word, r.cnt) for r in wc.collect()}
    rt = {(r.key, r.value) for r in back.collect()}
    assert rt == orig


def test_wholetext_reads_one_row_per_file(spark):
    df = read_text_dir(spark, FIXTURE_DIR, wholetext=True)
    assert df.count() == 2


def test_glob_filter(spark):
    df = read_text_dir(spark, FIXTURE_DIR, glob="a.txt")
    assert df.count() == 3  # lines of a.txt only
