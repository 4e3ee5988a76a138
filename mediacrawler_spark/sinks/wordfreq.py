"""Word-frequency artifact sink — the reference's word-cloud tool
(tools/words.py:41-75 AsyncWordCloudGenerator) as a Spark job.

The reference jieba-segments all content, drops stop words, writes
``{prefix}_word_freq.json`` (full frequency dict, ``ensure_ascii=False``,
``indent=4``) and renders a word-cloud PNG of the top-20. Here:

- segmentation + counting run distributed (functions/segment.py — the
  same jieba/FMM path, explode → hash-agg);
- only the top ``max_words`` rows are collected (the reference collects
  every word into a driver Counter, which is fine single-node and fatal
  at corpus scale — deliberate, documented deviation);
- the JSON artifact format matches the reference byte-for-byte
  conventions; the PNG uses wordcloud+matplotlib when importable and
  otherwise a built-in dependency-free renderer (sinks/pngcanvas.py),
  so the word-cloud artifact exists in every environment.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from mediacrawler_spark.functions.segment import wordcount_topk


def save_word_frequency(
    docs: DataFrame,
    out_prefix: str,
    text_col: str = "text",
    stopwords: list[str] | None = None,
    max_words: int = 10_000,
    cloud_top: int = 20,
) -> dict[str, int]:
    """Write ``{out_prefix}_word_freq.json`` and (optionally) a word-cloud
    PNG; returns the collected frequency dict (count-desc, word-asc)."""
    rows = wordcount_topk(docs, text_col, k=max_words, stopwords=stopwords).collect()
    freq = {r["word"]: int(r["n"]) for r in rows}
    with open(f"{out_prefix}_word_freq.json", "w", encoding="utf-8") as f:
        json.dump(freq, f, ensure_ascii=False, indent=4)
    _maybe_cloud(dict(list(freq.items())[:cloud_top]), out_prefix)
    return freq


def _maybe_cloud(top_freq: dict[str, int], out_prefix: str) -> bool:
    """Render ``{prefix}_word_cloud.png`` — the wordcloud/matplotlib
    stack when present (tools/words.py:58-75); otherwise a built-in
    dependency-free renderer (sinks/pngcanvas.py: 5x7 bitmap glyphs,
    frequency-scaled, stdlib PNG encoder) so the artifact always exists."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from wordcloud import WordCloud
    except ImportError:
        from mediacrawler_spark.sinks.pngcanvas import render_wordcloud, write_png

        write_png(render_wordcloud(top_freq), f"{out_prefix}_word_cloud.png")
        return True
    wc = WordCloud(
        width=800, height=400, background_color="white", max_words=200
    ).generate_from_frequencies(top_freq)
    plt.figure(figsize=(10, 5), facecolor="white")
    plt.imshow(wc, interpolation="bilinear")
    plt.axis("off")
    plt.tight_layout(pad=0)
    plt.savefig(f"{out_prefix}_word_cloud.png", format="png", dpi=300)
    plt.close()
    return True
