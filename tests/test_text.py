import math

from pyspark.sql import functions as F

from sfr_ingest_pipeline_spark.functions import text as TX


def _one(spark, col_expr, text):
    df = spark.createDataFrame([(text,)], ["text"])
    return df.select(col_expr.alias("v")).collect()[0]["v"]


def test_token_count(spark):
    assert _one(spark, TX.token_count("text"), "a b  c\td") == 4
    assert _one(spark, TX.token_count("text"), "") == 0
    assert _one(spark, TX.token_count("text"), "   ") == 0
    assert _one(spark, TX.token_count("text"), "one") == 1


def test_stopword_and_punct(spark):
    assert _one(spark, TX.stopword_count("text"), "the cat and the dog") == 3
    assert _one(spark, TX.punct_count("text"), "a, b; c! d?") == 4


def test_quality_score_formula(spark):
    text = "the quick brown fox, it is fast."
    got = _one(spark, TX.quality_score("text"), text)
    n_tok, stop, punct = 7.0, 3.0, 2.0  # the, is + 'it'? -> verify below
    # recompute from the component columns to avoid double-booking the spec
    n_tok = float(_one(spark, TX.token_count("text"), text))
    stop = float(_one(spark, TX.stopword_count("text"), text))
    punct = float(_one(spark, TX.punct_count("text"), text))
    expected = (
        math.log(1.0 + n_tok) * 0.5 + (stop / max(n_tok, 1.0)) * 2.0
        - punct / max(n_tok, 1.0)
    )
    assert abs(got - expected) < 1e-9


def test_lang_id(spark):
    cases = {
        "the cat and the dog is here": "en",
        "der hund und die katze ist da": "de",
        "le chat et la maison est grande": "fr",
        "el gato y los perros es grande": "es",
        "xyzzy plugh qwerty": "und",
    }
    for text, lang in cases.items():
        assert _one(spark, TX.lang_id("text"), text) == lang, text


def test_fingerprint_canonicalizes(spark):
    a = _one(spark, TX.fingerprint("text"), "Hello,   World!")
    b = _one(spark, TX.fingerprint("text"), "hello world")
    c = _one(spark, TX.fingerprint("text"), "different text")
    assert a == b
    assert a != c
