"""Language-ID accuracy on a mixed-language fixture (round-3 verdict #6):
14 languages, ratio-normalized stopword scoring, case-insensitive matching.
"""

from pyspark.sql import functions as F

from spiderman_spark.operators import textstats

# two natural-ish sentences per language, stopwords in context
SENTENCES = {
    "en": ["The cat sat on the mat and it was happy with that outcome.",
           "It is a story of the sea, told in the words of his father."],
    "fr": ["Le chat est dans la maison et les enfants jouent pour le plaisir.",
           "Il ne faut pas courir sur la route des vacances."],
    "es": ["El perro corre por la calle con los niños y sus amigos.",
           "Las casas de la ciudad son más grandes que las del pueblo, pero bonitas."],
    "de": ["Der Hund läuft mit dem Kind auf die Straße und ist nicht müde.",
           "Das Haus ist ein Ort für die Familie, auch im Winter."],
    "it": ["Il gatto dorme nel giardino della casa e sono tutti contenti, anche il cane, più o meno.",
           "Anche come ieri, il treno del mattino è partito più tardi del previsto, come sempre nel caos."],
    "pt": ["O menino não quer uma bicicleta para o natal, mais do que tudo.",
           "Os livros que ele lê são mais interessantes do que os filmes, como sempre."],
    "nl": ["De kinderen spelen met een bal in het park en zijn niet moe.",
           "Het huis van mijn ouders is ook groot, met een tuin aan de gracht."],
    "sv": ["Det är en vacker dag och han går på promenad med hunden för att det inte regnar.",
           "Hon sa att det som är viktigt är att man är snäll, och inte med flit, sa han."],
    "da": ["Det er en god dag, og han går en tur med hunden til stranden, ikke sandt.",
           "Den gamle mand er ikke som de andre, og det ved han godt."],
    "pl": ["Nie wiem, jak to się stało, ale jest już po wszystkim, tak myślę.",
           "Co z tego, że pada deszcz, jak do domu jest tak blisko, że nie szkodzi."],
    "tr": ["Bu bir kitap ve ben onu çok severek okudum, daha ne olsun ki.",
           "Ankara'ya gitmek için tren daha hızlı ama otobüs gibi ucuz değil, ne yazık ki bu böyle."],
    "id": ["Anak itu pergi ke pasar dengan ibunya untuk membeli beras dan ikan dari pedagang.",
           "Buku ini akan dibaca oleh siswa yang rajin di dalam kelas pada pagi hari."],
    "ro": ["Și copiii merg la școală în fiecare zi cu autobuzul din oraș.",
           "Este un oraș frumos, cu parcuri mari și oameni care nu se grăbesc mai deloc."],
    "ru": ["Он сказал, что это не так важно, но она не согласилась с ним.",
           "И вот они идут по улице, и он смотрит на небо, что по-своему красиво."],
}


def test_lang_id_accuracy_mixed_fixture(spark):
    rows = [
        (f"{lang}-{i}", lang, s)
        for lang, ss in SENTENCES.items()
        for i, s in enumerate(ss)
    ]
    df = spark.createDataFrame(rows, "doc_id string, expected string, text string")
    got = df.select(
        "doc_id", "expected", textstats.lang_id(F.col("text")).alias("guess")
    ).collect()
    wrong = [(r["doc_id"], r["expected"], r["guess"]) for r in got if r["expected"] != r["guess"]]
    assert not wrong, wrong


def test_lang_id_coverage_und_and_case(spark):
    assert len(textstats.LANG_STOPWORDS) >= 12
    df = spark.createDataFrame(
        [("u1", "zzz qqq xxx www"), ("u2", ""), ("c1", "THE CAT IS ON THE MAT AND IT IS HIS")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r["g"] for r in df.select("doc_id", textstats.lang_id(F.col("text")).alias("g")).collect()}
    assert got["u1"] == "und" and got["u2"] == "und"
    assert got["c1"] == "en"  # case-insensitive matching


def test_lang_id_normalization_beats_list_length(spark):
    """A language with a LONGER list must not win on raw hit count: 2 hits
    out of ru's 14 (1428 bp) loses to 2 hits out of pl's 12 (1666 bp)."""
    from spiderman_spark.operators.textstats import stopword_score_bp

    df = spark.createDataFrame([("x", "nie tak")], "doc_id string, text string")
    r = df.select(
        stopword_score_bp(F.col("text"), "pl").alias("pl"),
        textstats.lang_id(F.col("text")).alias("g"),
    ).collect()[0]
    assert r["pl"] == 10000 * 2 // len(textstats.LANG_STOPWORDS["pl"])
    assert r["g"] == "pl"
