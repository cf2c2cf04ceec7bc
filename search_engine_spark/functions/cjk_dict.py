"""Vendored CJK segmenter: forward maximum matching over a small bundled
word list (reference I3 role — txt-seg/txt-seg.cpp:49-78 feeds mixed runs to
jieba's CutForSearch; jieba is not available in this container, so this is
the self-contained stand-in).

The word list is common everyday Mandarin vocabulary (general public
knowledge — no external corpus or wordlist file is shipped). Forward
maximum matching (FMM) is the classic dictionary segmentation baseline:
at each position take the LONGEST dictionary word that matches, else fall
back to a single character (the unigram degenerate case). Deviation from
jieba noted: CutForSearch additionally re-emits sub-words of long matches;
FMM emits each span once. Swap in jieba where it is installed via the
``segment=`` hook in mix_tokenizer.

Punctuation/symbol codepoints are skipped — the reference skips jieba
tokens tagged "x" (txt-seg.cpp:60-62).
"""

from __future__ import annotations

import unicodedata

# Common Mandarin vocabulary, 2-4 characters (FMM prefers the longest match,
# so e.g. 北京大学 wins over 北京 + 大学 where present).
CJK_WORDS: tuple[str, ...] = (
    # pronouns / people
    "我们", "你们", "他们", "她们", "大家", "自己", "先生", "小姐",
    "朋友", "孩子", "父母", "学生", "老师", "医生", "工人", "作者",
    # places / institutions
    "中国", "北京", "上海", "广州", "香港", "台湾", "美国", "日本",
    "英国", "法国", "德国", "世界", "国家", "城市", "地方", "学校",
    "大学", "医院", "公司", "图书馆", "餐厅", "北京大学",
    # language / study
    "中文", "汉语", "英语", "语言", "文化", "学习", "教育", "历史",
    "数学", "科学", "物理", "化学", "生物", "文学", "艺术", "音乐",
    # tech (the reference indexes a math/CS Q&A site)
    "计算机", "互联网", "电脑", "手机", "电话", "电影", "网络", "软件",
    "硬件", "程序", "算法", "数据", "系统", "信息", "技术", "搜索",
    "引擎", "分词", "索引", "查询", "函数", "方程", "表达式", "数字",
    "结果", "方法", "分析", "模型", "训练", "测试", "标点", "符号",
    # time
    "时间", "今天", "明天", "昨天", "现在", "以前", "以后", "星期",
    "小时", "分钟", "上午", "下午", "晚上", "早上", "去年", "明年",
    # common verbs / function words
    "什么", "怎么", "为什么", "因为", "所以", "可以", "可能", "应该",
    "知道", "觉得", "认为", "喜欢", "希望", "需要", "使用", "开始",
    "结束", "发展", "研究", "工作", "生活", "问题", "事情", "东西",
    "已经", "还是", "但是", "如果", "虽然", "没有", "一起", "非常",
    "真的", "谢谢", "再见", "你好", "欢迎", "请问",
    # nature / misc nouns
    "天气", "下雨", "太阳", "月亮", "飞机", "火车", "汽车", "自行车",
    "经济", "政治", "社会", "新闻", "报纸", "故事", "电视", "房子",
)

_DICT = frozenset(CJK_WORDS)
_MAXLEN = max(len(w) for w in CJK_WORDS)


def fmm_segment(text: str) -> list[tuple[str, int]]:
    """Forward-maximum-matching segmenter -> [(word, char_offset)].

    ASCII letter runs emit as single words (the mixed run hands them over
    together with the CJK text); CJK spans match longest-first against the
    bundled dictionary, falling back to unigrams; punctuation/symbol
    codepoints and non-letter ASCII are skipped.
    """
    out: list[tuple[str, int]] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch.isascii():
            if ch.isalpha():
                j = i + 1
                while j < n and text[j].isascii() and text[j].isalpha():
                    j += 1
                out.append((text[i:j], i))
                i = j
            else:
                i += 1
            continue
        matched = False
        for length in range(min(_MAXLEN, n - i), 1, -1):
            w = text[i : i + length]
            if w in _DICT:
                out.append((w, i))
                i += length
                matched = True
                break
        if matched:
            continue
        if unicodedata.category(ch)[0] not in ("P", "S"):
            out.append((ch, i))
        i += 1
    return out
