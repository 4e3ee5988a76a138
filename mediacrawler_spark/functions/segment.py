"""CJK-aware word segmentation for the word-frequency analytics (A1/A2).

The reference segments Chinese with jieba before counting
(tools/words.py:43 ``jieba.lcut``); a regex tokenizer cannot split
unspaced CJK text, so word counts on the reference's seven Chinese
platforms would be wrong without this. Strategy:

- if ``jieba`` is importable it is used for CJK runs (full parity);
- otherwise a bundled small dictionary + forward maximum matching (FMM,
  the classic greedy longest-match segmenter) covers the common-word core;
  out-of-vocabulary CJK characters fall back to single-character tokens —
  deterministic and good enough for frequency analytics;
- non-CJK runs use the same letter/number regex as
  :func:`mediacrawler_spark.functions.textual.tokens` (lowercased).

Implemented as a vectorized pandas UDF (Arrow batches, per-batch Python —
acceptable here because segmentation is inherently dictionary lookup;
the explode → groupBy shape around it is unchanged, so the heavy
aggregation stays JVM-side).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# A compact common-word dictionary (2-4 chars). Deployments extend this or
# install jieba; the operator shape is identical either way.
_CJK_DICT = frozenset(
    """
    我们 你们 他们 她们 自己 什么 怎么 为什么 这个 那个 这里 那里 现在 今天
    明天 昨天 时间 时候 可以 不能 没有 知道 觉得 认为 喜欢 分享 朋友 大家
    一起 真的 非常 特别 但是 因为 所以 如果 还是 就是 不是 已经 正在 开始
    结束 问题 东西 地方 世界 中国 北京 上海 工作 学习 学校 老师 学生 孩子
    父母 家庭 生活 快乐 幸福 健康 身体 运动 音乐 电影 视频 直播 评论 点赞
    关注 粉丝 博主 笔记 内容 推荐 搜索 平台 用户 数据 信息 手机 电脑 网络
    购物 美食 旅行 旅游 攻略 照片 图片 好看 漂亮 可爱 有趣 有用 希望 感觉
    小红书 抖音 微博 知乎 贴吧 快手 哔哩哔哩
    """.split()
)
_MAX_WORD_LEN = max(len(w) for w in _CJK_DICT)
_CJK_RUN = re.compile(r"[㐀-䶿一-鿿豈-﫿]+")
_WORD_RUN = re.compile(r"[^\W_]+", re.UNICODE)


def _fmm(run: str, dictionary: frozenset, max_len: int) -> list[str]:
    """Forward maximum matching: greedy longest dictionary word at each
    position; single character on miss."""
    out: list[str] = []
    i, n = 0, len(run)
    while i < n:
        for ln in range(min(max_len, n - i), 1, -1):
            w = run[i : i + ln]
            if w in dictionary:
                out.append(w)
                i += ln
                break
        else:
            out.append(run[i])
            i += 1
    return out


def _jieba_or_none():
    try:
        import jieba  # type: ignore

        jieba.setLogLevel(60)
        return jieba
    except ImportError:
        return None


def segment_one(text: str, jieba_mod=None) -> list[str]:
    """Segment one text: CJK runs via jieba/FMM, the rest via the regex
    tokenizer (lowercased) — preserving document order."""
    if not text:
        return []
    out: list[str] = []
    pos = 0
    for m in _CJK_RUN.finditer(text):
        if m.start() > pos:
            out.extend(t.lower() for t in _WORD_RUN.findall(text[pos : m.start()]))
        run = m.group(0)
        if jieba_mod is not None:
            out.extend(w for w in jieba_mod.lcut(run) if w.strip())
        else:
            out.extend(_fmm(run, _CJK_DICT, _MAX_WORD_LEN))
        pos = m.end()
    if pos < len(text):
        out.extend(t.lower() for t in _WORD_RUN.findall(text[pos:]))
    return out


def segment_tokens(col: Column) -> Column:
    """Vectorized pandas UDF: text → array<string> of segmented tokens."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def seg(texts: pd.Series) -> pd.Series:
        jieba_mod = _jieba_or_none()
        return texts.map(lambda s: segment_one(s or "", jieba_mod))

    return seg(col)


def wordcount_topk(df, text_col: str = "text", k: int = 20, stopwords: list[str] | None = None):
    """A1/A2: CJK-aware word-frequency top-k — the reference's jieba
    word-count (tools/words.py:41-61) as explode → hash-agg → top-k.
    ``stopwords`` mirrors the reference's stop-word file filter."""
    toks = df.select(F.explode(segment_tokens(F.col(text_col))).alias("word"))
    if stopwords:
        toks = toks.filter(~F.col("word").isin(*stopwords))
    return (
        toks.groupBy("word")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(k)
    )
