"""Vendored CJK segmenter: forward maximum matching + CutForSearch-style
sub-word re-emission over a bundled word list (reference I3 role —
txt-seg/txt-seg.cpp:49-78 feeds mixed runs to jieba's CutForSearch; jieba
is not available in this container, so this is the self-contained
stand-in).

The word list is common everyday Mandarin vocabulary (general public
knowledge — no external corpus or wordlist file is shipped). Forward
maximum matching (FMM) is the classic dictionary segmentation baseline:
at each position take the LONGEST dictionary word that matches, else fall
back to a single character (the unigram degenerate case). On top of FMM,
``fmm_segment`` mirrors CutForSearch's recall trick: a matched word of 3+
characters ALSO re-emits its in-dictionary 2-character (and, for 4+, its
3-character) sub-words at their own offsets before the full word — so
北京大学 emits 北京, 大学, 北京大学 and a query for 大学 recalls the
document (jieba ``cut_for_search`` semantics). Swap in jieba itself where
installed via the ``segment=`` hook in mix_tokenizer.

Punctuation/symbol codepoints are skipped — the reference skips jieba
tokens tagged "x" (txt-seg.cpp:60-62).
"""

from __future__ import annotations

import unicodedata

# Common Mandarin vocabulary, 2-4 characters (FMM prefers the longest match,
# so e.g. 北京大学 wins over 北京 + 大学 where present). Frequency-ranked in
# spirit: everyday function words and high-frequency nouns/verbs first,
# then domain vocabulary (the reference indexes a math/CS Q&A site).
CJK_WORDS: tuple[str, ...] = (
    # pronouns / people
    "我们", "你们", "他们", "她们", "它们", "大家", "自己", "别人",
    "先生", "女士", "小姐", "朋友", "孩子", "父母", "爸爸", "妈妈",
    "哥哥", "姐姐", "弟弟", "妹妹", "爷爷", "奶奶", "丈夫", "妻子",
    "家人", "家庭", "同学", "同事", "邻居", "客人", "人们", "人民",
    "学生", "老师", "教授", "医生", "护士", "工人", "农民", "司机",
    "警察", "律师", "记者", "作者", "作家", "画家", "歌手", "演员",
    "经理", "老板", "员工", "专家", "科学家", "工程师", "程序员",
    # places / institutions
    "中国", "北京", "上海", "广州", "深圳", "南京", "杭州", "成都",
    "重庆", "天津", "武汉", "西安", "香港", "澳门", "台湾", "美国",
    "日本", "韩国", "英国", "法国", "德国", "俄罗斯", "印度", "泰国",
    "欧洲", "亚洲", "非洲", "世界", "国家", "政府", "城市", "农村",
    "地方", "地区", "附近", "里面", "外面", "上面", "下面", "中间",
    "学校", "大学", "中学", "小学", "幼儿园", "医院", "银行", "邮局",
    "公司", "工厂", "商店", "超市", "市场", "饭店", "餐厅", "宾馆",
    "机场", "车站", "公园", "广场", "博物馆", "图书馆", "电影院",
    "办公室", "教室", "宿舍", "厨房", "房间", "北京大学", "清华大学",
    # language / study / culture
    "中文", "汉语", "英文", "英语", "日语", "法语", "普通话", "方言",
    "语言", "文字", "汉字", "单词", "句子", "文章", "内容", "意思",
    "文化", "传统", "习惯", "节日", "春节", "历史", "地理", "哲学",
    "数学", "科学", "物理", "化学", "生物", "医学", "文学", "艺术",
    "音乐", "美术", "体育", "运动", "足球", "篮球", "乒乓球", "游泳",
    "学习", "教育", "知识", "课程", "作业", "考试", "成绩", "毕业",
    "练习", "复习", "预习", "读书", "写作", "翻译", "字典", "词典",
    # tech / math (the reference's domain: math & CS Q&A)
    "计算机", "互联网", "电脑", "手机", "电话", "电视", "电影", "照片",
    "照相机", "网络", "网站", "网页", "邮件", "软件", "硬件", "程序",
    "代码", "算法", "数据", "数据库", "系统", "信息", "技术", "科技",
    "搜索", "引擎", "分词", "索引", "查询", "排序", "存储", "计算",
    "函数", "方程", "公式", "表达式", "变量", "常数", "数字", "数值",
    "矩阵", "向量", "集合", "概率", "统计", "几何", "代数", "微积分",
    "定理", "证明", "假设", "条件", "结论", "定义", "性质", "规律",
    "结果", "方法", "方式", "过程", "步骤", "分析", "研究",
    "模型", "训练", "测试", "实验", "标点", "符号", "图形", "图片",
    "文件", "文档", "页面", "用户", "密码", "登录", "下载", "上传",
    "机器", "人工", "智能", "智慧", "自动", "效率",
    "人工智能", "机器学习", "深度学习", "神经网络", "大数据",
    "操作系统", "编程语言", "自然语言",
    # time
    "时间", "时候", "今天", "明天", "昨天", "前天", "后天", "现在",
    "过去", "将来", "未来", "以前", "以后", "之前", "之后", "最近",
    "星期", "周末", "月份", "年代", "世纪", "季节", "春天", "夏天",
    "秋天", "冬天", "小时", "分钟", "秒钟", "上午", "中午", "下午",
    "晚上", "早上", "早晨", "夜里", "去年", "今年", "明年", "每天",
    "生日", "假期", "暑假", "寒假", "马上", "立刻", "已经", "曾经",
    "刚才", "后来", "然后", "最后", "终于", "永远", "一直", "总是",
    "经常", "有时", "偶尔", "从来", "正在", "突然",
    # verbs
    "知道", "认识", "了解", "明白", "理解", "记得", "忘记", "想到",
    "觉得", "感觉", "认为", "相信", "怀疑", "同意", "反对", "决定",
    "选择", "希望", "打算", "计划", "准备", "需要", "使用", "利用",
    "开始", "结束", "继续", "停止", "完成", "成功", "失败", "发展",
    "变化", "增加", "减少", "提高", "降低", "改变", "改善", "影响",
    "帮助", "支持", "鼓励", "表扬", "批评", "讨论", "交流", "沟通",
    "介绍", "解释", "说明", "表示", "表达", "告诉", "回答", "提问",
    "学会", "教学", "工作", "休息", "睡觉", "起床", "吃饭", "喝水",
    "做饭", "洗澡", "穿衣", "买卖", "购物", "付钱", "花钱", "赚钱",
    "旅游", "旅行", "参观", "访问", "见面", "聊天", "唱歌", "跳舞",
    "画画", "游戏", "玩儿", "生活", "居住", "搬家", "出发", "到达",
    "回来", "回去", "离开", "经过", "通过", "进入", "出去", "上班",
    "下班", "上课", "下课", "开车", "坐车", "走路", "跑步", "锻炼",
    "生病", "看病", "吃药", "住院", "出院", "打电话", "发短信",
    "上网", "发现", "发明", "创造", "建设", "修理", "打扫", "整理",
    "出现", "消失", "发生", "存在", "得到", "失去", "获得", "取得",
    # function words / adverbs / conjunctions
    "什么", "怎么", "怎样", "为什么", "哪里", "哪儿", "多少", "几个",
    "因为", "所以", "由于", "因此", "虽然", "但是", "可是", "不过",
    "而且", "并且", "或者", "还是", "如果", "要是", "只要", "只有",
    "无论", "不管", "即使", "尽管", "除了", "关于", "对于", "根据",
    "按照", "为了", "可以", "可能", "能够", "应该", "必须",
    "一定", "肯定", "当然", "也许", "大概", "差不多", "几乎", "完全",
    "非常", "特别", "十分", "比较", "更加", "最多", "最少", "至少",
    "一起", "一共", "一般", "一样", "不同", "一些", "有点", "有些",
    "真的", "确实", "其实", "当时", "本来", "原来", "果然", "竟然",
    "谢谢", "再见", "你好", "欢迎", "请问", "对不起", "没关系",
    "不客气", "没有", "不要", "别的", "这个", "那个", "这些", "那些",
    "这里", "那里", "这样", "那样", "每个", "各种", "所有", "任何",
    # nature / objects / misc nouns
    "天气", "下雨", "下雪", "刮风", "太阳", "月亮", "星星", "天空",
    "空气", "环境", "污染", "温度", "气候", "山水", "河流", "大海",
    "海洋", "森林", "树木", "花园", "动物", "植物", "老虎", "熊猫",
    "小猫", "小狗", "鸟儿", "鱼儿", "苹果", "香蕉", "西瓜", "水果",
    "蔬菜", "米饭", "面条", "饺子", "面包", "牛奶", "咖啡", "啤酒",
    "茶叶", "鸡蛋", "牛肉", "羊肉", "猪肉", "味道", "好吃", "好喝",
    "衣服", "裤子", "鞋子", "帽子", "眼镜", "手表", "钱包", "行李",
    "东西", "物品", "礼物", "玩具", "家具", "桌子", "椅子", "沙发",
    "床上", "门口", "窗户", "墙上", "地上", "楼上", "楼下", "电梯",
    "飞机", "火车", "汽车", "公共汽车", "出租车", "地铁", "自行车",
    "轮船", "道路", "马路", "街道", "桥梁", "红绿灯", "地图", "方向",
    "经济", "政治", "社会", "法律", "新闻", "消息", "报纸", "杂志",
    "广告", "故事", "小说", "诗歌", "房子", "建筑", "价格", "价值",
    "质量", "数量", "重量", "身体", "健康", "心情", "感情", "爱情",
    "友谊", "快乐", "高兴", "幸福", "难过", "伤心", "生气", "着急",
    "害怕", "担心", "放心", "舒服", "累了", "困了", "饿了", "渴了",
    "问题", "事情", "原因", "理由", "目的", "目标", "机会",
    "梦想", "理想", "办法", "主意", "意见", "建议", "态度", "精神",
    "能力", "水平", "经验", "教训", "错误", "正确", "重要", "主要",
    "简单", "容易", "困难", "复杂", "方便", "安全", "危险", "干净",
    "漂亮", "美丽", "可爱", "聪明", "努力", "认真", "仔细", "小心",
    "热情", "友好", "礼貌", "诚实", "勇敢", "坚持", "放弃", "满意",
)

_DICT = frozenset(CJK_WORDS)
_MAXLEN = max(len(w) for w in CJK_WORDS)


def _emit_search_subwords(word: str, offset: int, out: list) -> None:
    """CutForSearch recall trick (jieba ``cut_for_search``): a 3+ char
    dictionary word also emits its in-dictionary 2-char (and, for 4+ char
    words, 3-char) sub-words at their own offsets BEFORE the full word."""
    n = len(word)
    if n > 2:
        for i in range(n - 1):
            sub = word[i : i + 2]
            if sub in _DICT:
                out.append((sub, offset + i))
    if n > 3:
        for i in range(n - 2):
            sub = word[i : i + 3]
            if sub in _DICT:
                out.append((sub, offset + i))


def fmm_segment(text: str, search_subwords: bool = True) -> list[tuple[str, int]]:
    """Forward-maximum-matching segmenter -> [(word, char_offset)].

    ASCII letter runs emit as single words (the mixed run hands them over
    together with the CJK text); CJK spans match longest-first against the
    bundled dictionary, falling back to unigrams; punctuation/symbol
    codepoints and non-letter ASCII are skipped. With ``search_subwords``
    (default, the reference's CutForSearch mode) long dictionary matches
    re-emit their in-dictionary sub-words for recall.
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
                if search_subwords:
                    _emit_search_subwords(w, i, out)
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
