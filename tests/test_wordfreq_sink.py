"""Word-frequency artifact sink (tools/words.py analog)."""

import json

from mediacrawler_spark.sinks.wordfreq import save_word_frequency


def test_word_freq_json_artifact(spark, tmp_path):
    docs = spark.createDataFrame(
        [("今天分享美食攻略",), ("今天天气好 awesome awesome",), ("分享 awesome",)],
        "text string",
    )
    prefix = str(tmp_path / "run1")
    freq = save_word_frequency(docs, prefix, stopwords=["天"])
    with open(f"{prefix}_word_freq.json", encoding="utf-8") as f:
        on_disk = json.load(f)
    assert on_disk == freq
    # segmented counts: 今天 x2, awesome x3, 分享 x2; stopword 天 dropped
    assert on_disk["awesome"] == 3
    assert on_disk["今天"] == 2 and on_disk["分享"] == 2
    assert "天" not in on_disk
    # reference format: ensure_ascii=False → raw CJK bytes in the file
    raw = open(f"{prefix}_word_freq.json", encoding="utf-8").read()
    assert "今天" in raw and "\\u" not in raw
