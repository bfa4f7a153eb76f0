"""N-Triples distributed sink/source round-trip."""

import os

from ontocast_spark.pipeline import run_pipeline
from ontocast_spark.schemas import CONVERSATIONS
from ontocast_spark.sources.ntriples import read_ntriples, write_ntriples
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
