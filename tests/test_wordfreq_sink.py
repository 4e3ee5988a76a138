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


def test_wordcloud_png_rendered_without_plot_stack(spark, tmp_path):
    """The PNG artifact must exist even without wordcloud/matplotlib:
    the built-in renderer encodes a real grayscale PNG (decodable by the
    package's own independent PNG decoder), deterministically."""
    import numpy as np

    from mediacrawler_spark.operators.media import png_decode_one
    from mediacrawler_spark.sinks.pngcanvas import render_wordcloud, write_png

    freq = {"spark": 40, "crawl": 25, "frontier": 9, "bloom": 4, "你好": 3}
    img1, img2 = render_wordcloud(freq), render_wordcloud(freq)
    assert (img1 == img2).all()  # deterministic
    assert img1.shape == (400, 800)
    assert (img1 < 200).sum() > 500  # real glyph pixels were drawn

    p = str(tmp_path / "cloud.png")
    write_png(img1, p)
    dec = png_decode_one(open(p, "rb").read())
    assert dec is not None
    w, h, gray = dec
    assert (w, h) == (800, 400)
    np.testing.assert_allclose(gray * 255.0, img1.astype(np.float32), atol=1e-3)

    # end-to-end through the sink (this container has no plot stack)
    docs = spark.createDataFrame(
        [("d1", "spark spark crawl"), ("d2", "spark crawl bloom")],
        "doc_id string, text string",
    )
    from mediacrawler_spark.sinks.wordfreq import save_word_frequency

    prefix = str(tmp_path / "wf")
    save_word_frequency(docs, prefix)
    import os

    assert os.path.isfile(f"{prefix}_word_freq.json")
    assert os.path.isfile(f"{prefix}_word_cloud.png")
    assert png_decode_one(open(f"{prefix}_word_cloud.png", "rb").read()) is not None
