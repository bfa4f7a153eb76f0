"""N-Triples distributed sink/source round-trip."""

import os

from ontocast_spark.pipeline import run_pipeline
from ontocast_spark.schemas import CONVERSATIONS
from ontocast_spark.sources.ntriples import (
    read_ntriples,
    to_ntriples_lines,
    write_ntriples,
)
from ontocast_spark.synth import gen_corpus


def test_ntriples_roundtrip(spark, tmp_path):
    conv = spark.createDataFrame(gen_corpus(4, seed=17, mega_every=0), CONVERSATIONS)
    kg = run_pipeline(spark, conv)["kg_triples"].select(
        "subj", "pred", "obj", "obj_is_literal", "obj_datatype"
    ).distinct()
    out = os.path.join(str(tmp_path), "nt")
    write_ntriples(kg, out)
    back = read_ntriples(spark, out)
    cols = ["subj", "pred", "obj", "obj_is_literal"]
    a, b = kg.select(cols), back.select(cols)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    # typed literals keep their datatype
    dt = {
        (r["obj"], r["obj_datatype"])
        for r in back.filter("obj_datatype is not null").collect()
    }
    dt_orig = {
        (r["obj"], r["obj_datatype"])
        for r in kg.filter("obj_datatype is not null").collect()
    }
    assert dt == dt_orig


def test_ntriples_escaping(spark, tmp_path):
    rows = [
        ("https://x/s", "https://x/p", 'he said "hi"\nnewline\ttab\\slash', True, None),
        # escape-order traps: literal backslash followed by r/n/t
        ("https://x/s", "https://x/p", "\\r", True, None),
        ("https://x/s", "https://x/p", "\\n\\t\\\\", True, None),
        ("https://x/s", "https://x/p", "https://x/o", False, None),
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_literal boolean, obj_datatype string"
    )
    out = os.path.join(str(tmp_path), "nt2")
    write_ntriples(df, out)
    back = read_ntriples(spark, out)
    objs = {r["obj"] for r in back.filter("obj_is_literal").collect()}
    assert 'he said "hi"\nnewline\ttab\\slash' in objs
    assert "\\r" in objs
    assert "\\n\\t\\\\" in objs


def test_ntriples_lang_and_unicode_escapes(spark, tmp_path):
    rows = [
        ("https://x/s", "https://x/p", "hello", True, "@en"),
        ("https://x/s", "https://x/p", "ctrl\x01char", True, None),
    ]
    df = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "obj_datatype string",
    )
    out = os.path.join(str(tmp_path), "nt3")
    write_ntriples(df, out)
    back = {
        (r["obj"], r["obj_datatype"])
        for r in read_ntriples(spark, out).collect()
    }
    assert ("hello", "@en") in back
    assert ("ctrl\x01char", None) in back  # raw U+0001 survives round-trip

    # externally-produced \uXXXX / \UXXXXXXXX escapes are expanded
    ext = os.path.join(str(tmp_path), "nt4")
    os.makedirs(ext)
    with open(os.path.join(ext, "part-0.txt"), "w") as f:
        f.write('<https://x/s> <https://x/p> "caf\\u00e9 \\U0001F600" .\n')
    got = read_ntriples(spark, ext).collect()[0]
    assert got["obj"] == "café \U0001F600"


def test_ntriples_obj_lang_column_merged(spark, tmp_path):
    df = spark.createDataFrame(
        [("https://x/s", "https://x/p", "bonjour", True, None, "fr")],
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "obj_datatype string, obj_lang string",
    )
    lines = [r["value"] for r in to_ntriples_lines(df).collect()]
    assert lines == ['<https://x/s> <https://x/p> "bonjour"@fr .']
