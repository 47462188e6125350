"""Specialty tokenizers/filters (ref: src/tokenizer/ registry)."""

from pyspark.sql import functions as F

from tantivy_spark.analyzer import (
    alphanum_only_filter,
    ascii_folding_chain,
    ngram_tokens,
    raw_analyzer,
    stopword_filter,
    tokens_col,
    whitespace_analyzer,
)


def _one(spark, col, text):
    return spark.createDataFrame([(text,)], "t STRING") \
        .select(col.alias("o")).collect()[0]["o"]


def test_raw(spark):
    assert list(_one(spark, raw_analyzer(F.col("t")), "Hello World!")) == ["Hello World!"]
    assert list(_one(spark, raw_analyzer(F.col("t")), "")) == []


def test_whitespace(spark):
    assert list(_one(spark, whitespace_analyzer(F.col("t")), " a\tB  c\n")) == ["a", "B", "c"]


def test_ngram(spark):
    # position-major emission (ngram_tokenizer.rs)
    got = list(_one(spark, ngram_tokens(F.col("t"), 2, 3), "abcd"))
    assert got == ["ab", "abc", "bc", "bcd", "cd"]


def test_stopword(spark):
    toks = tokens_col(F.col("t"))
    got = list(_one(spark, stopword_filter(toks, ["the", "of"]), "The rest of us"))
    assert got == ["rest", "us"]


def test_alphanum_only(spark):
    got = list(_one(spark, alphanum_only_filter(whitespace_analyzer(F.col("t"))),
                    "ab c-d 12"))
    assert got == ["ab", "12"]


def test_ascii_folding(spark):
    got = list(_one(spark, ascii_folding_chain(F.col("t")), "café naïve übel"))
    assert got == ["cafe", "naive", "ubel"]


def test_en_stem_chain(spark):
    from tantivy_spark.analyzer import en_stem_tokens_col

    got = list(_one(spark, en_stem_tokens_col(F.col("t")),
                    "Relational conditional replacement, hopefulness!"))
    assert got == ["relat", "condit", "replac", "hope"]


def test_porter_vectors():
    from tantivy_spark.functions.porter import porter_stem

    vectors = {
        "caresses": "caress", "ponies": "poni", "motoring": "motor",
        "agreed": "agre", "electrical": "electr", "adjustable": "adjust",
        "vietnamization": "vietnam", "sensibiliti": "sensibl",
        "rate": "rate", "roll": "roll", "sky": "sky",
    }
    for w, want in vectors.items():
        assert porter_stem(w) == want, w


SNOWBALL_VECTORS = {
    # hand-derived by tracing the published Snowball algorithm
    # descriptions (snowballstem.org); several are the algorithms' own
    # worked examples (e.g. majestueusement, continuellement, animaux)
    "de": {
        "kinder": "kind", "kindern": "kind", "häuser": "haus",
        "aufgaben": "aufgab", "schönes": "schon", "bücher": "buch",
        "laufen": "lauf", "verhältnisse": "verhaltnis",
        "freundlichkeit": "freundlich", "bedeutungen": "bedeut",
        "schnellste": "schnell", "straße": "strass", "mädchen": "madch",
    },
    "es": {
        "niños": "niñ", "cantando": "cant", "cantaremos": "cant",
        "rápidamente": "rapid", "felicidad": "felic",
        "organización": "organiz", "comunicativa": "comunic",
        "lógica": "logic", "corriendo": "corr", "hablaron": "habl",
        "grandes": "grand", "diciéndoselo": "dic",
    },
    "fr": {
        "chanter": "chant", "chantaient": "chant", "nationaux": "national",
        "grandement": "grand", "continuellement": "continuel",
        "majestueusement": "majestu", "communication": "commun",
        "animaux": "animal", "finissons": "fin", "maisons": "maison",
        "belles": "bel", "mangeait": "mang",
    },
    # hand-traced from the published algorithm descriptions
    "it": {
        "abbandonata": "abbandon", "felicità": "felic", "cantando": "cant",
        "nazionale": "nazional", "pronunciare": "pronunc",
        "mangiavano": "mang", "libri": "libr", "azione": "azion",
    },
    "pt": {
        "quilométricas": "quilométr", "felicidade": "felic",
        "cantando": "cant", "organizações": "organiz", "meninas": "menin",
        "bondade": "bondad", "falaram": "fal",
    },
    "nl": {
        "lichamelijk": "licham", "gelukkig": "gelukk", "haren": "har",
        "bomen": "bom", "werkelijkheid": "werkelijk", "katten": "kat",
        "huizen": "huiz",
    },
    "ru": {
        "книгами": "книг", "важная": "важн", "делаться": "дела",
        "красивые": "красив", "читавшие": "чита", "столом": "стол",
    },
    "da": {
        "undersøgelse": "undersøg", "mulighederne": "mulighed",
        "billeder": "billed", "venligst": "ven", "indeholdt": "indehold",
    },
    "no": {
        "muligheten": "mul", "kildene": "kild", "norske": "norsk",
        "forskjellige": "forskjel",
    },
    "sv": {
        "möjligheterna": "möj", "utbildningen": "utbildning",
        "svenska": "svensk", "klokkorna": "klokk", "betydelse": "betyd",
    },
    # hand-traced through the published romanian/finnish/hungarian/
    # turkish algorithm descriptions (r04)
    "ro": {
        "lucrurile": "lucrur", "frumoasă": "frumoas", "cântând": "cânt",
        "românească": "român", "importante": "import",
        # comma-below spellings normalize to the cedilla the published
        # algorithm uses
        "acțiune": "acţiun",
    },
    "fi": {
        "taloissa": "talo", "autolla": "auto", "kirjat": "kirj",
        "kirjassa": "kirj", "miehen": "miehe", "kaupungissa": "kaupung",
    },
    "hu": {
        "házakban": "ház", "gépekkel": "gép", "almákat": "alma",
        "házaim": "ház", "könyvek": "könyv", "emberek": "ember",
    },
    "tr": {
        "kitaplar": "kitap", "kediler": "kedi", "arabaları": "araba",
        "evlerinde": "ev", "kitabı": "kitap", "okuldaki": "okul",
        "bahçede": "bahçe",
    },
}


def test_snowball_vectors():
    from tantivy_spark.functions.snowball import (
        danish_stem, dutch_stem, french_stem, german_stem, italian_stem,
        norwegian_stem, portuguese_stem, russian_stem, spanish_stem,
        swedish_stem)

    from tantivy_spark.functions.snowball2 import (
        finnish_stem, hungarian_stem, romanian_stem, turkish_stem)

    fns = {"de": german_stem, "es": spanish_stem, "fr": french_stem,
           "it": italian_stem, "pt": portuguese_stem, "nl": dutch_stem,
           "ru": russian_stem, "da": danish_stem, "no": norwegian_stem,
           "sv": swedish_stem, "ro": romanian_stem, "fi": finnish_stem,
           "hu": hungarian_stem, "tr": turkish_stem}
    for lang, vecs in SNOWBALL_VECTORS.items():
        for w, want in vecs.items():
            assert fns[lang](w) == want, (lang, w, fns[lang](w))


def test_snowball_chains_distributed(spark):
    """The {de,es,fr}_stem analyzers run the same stems through the
    Arrow-batched UDF path."""
    from tantivy_spark.analyzer import (
        de_stem_tokens_col, es_stem_tokens_col, fr_stem_tokens_col)

    got = list(_one(spark, de_stem_tokens_col(F.col("t")),
                    "Kinder häuser Bedeutungen"))
    assert got == ["kind", "haus", "bedeut"]
    got = list(_one(spark, es_stem_tokens_col(F.col("t")),
                    "niños cantando rápidamente"))
    assert got == ["niñ", "cant", "rapid"]
    got = list(_one(spark, fr_stem_tokens_col(F.col("t")),
                    "chantaient nationaux continuellement"))
    assert got == ["chant", "national", "continuel"]


def test_snowball_new_chains_distributed(spark):
    """The {it,pt,nl,ru}_stem analyzers run the same stems through the
    Arrow-batched UDF path."""
    from tantivy_spark.analyzer import (
        it_stem_tokens_col, nl_stem_tokens_col, pt_stem_tokens_col,
        ru_stem_tokens_col)

    got = list(_one(spark, it_stem_tokens_col(F.col("t")),
                    "abbandonata cantando felicità"))
    assert got == ["abbandon", "cant", "felic"]
    got = list(_one(spark, pt_stem_tokens_col(F.col("t")),
                    "organizações cantando felicidade"))
    assert got == ["organiz", "cant", "felic"]
    got = list(_one(spark, nl_stem_tokens_col(F.col("t")),
                    "lichamelijk gelukkig haren"))
    assert got == ["licham", "gelukk", "har"]
    got = list(_one(spark, ru_stem_tokens_col(F.col("t")),
                    "книгами важная красивые"))
    assert got == ["книг", "важн", "красив"]


def test_regex_tokenizer(spark):
    from tantivy_spark.analyzer import regex_tokenizer
    got = list(_one(spark, regex_tokenizer(r"[0-9]+")(F.col("t")),
                    "a1 bb22 c333d"))
    assert got == ["1", "22", "333"]


def test_facet_tokenizer(spark):
    from tantivy_spark.analyzer import facet_tokens
    got = list(_one(spark, facet_tokens(F.col("t")),
                    "/america/north_america/canada"))
    # the ROOT facet leads (facet_tokenizer.rs test_facet_tokenizer pins
    # ["/", "/top", "/top/a", "/top/a/b"] for /top/a/b)
    assert got == ["/", "/america", "/america/north_america",
                   "/america/north_america/canada"]
    # explicit root facet == the reference's Facet::root() -> ["/"]
    assert list(_one(spark, facet_tokens(F.col("t")), "")) == ["/"]
    assert list(_one(spark, facet_tokens(F.col("t")), None)) == []


def test_split_compound_words(spark):
    from tantivy_spark.analyzer import split_compound_words, whitespace_analyzer
    chain = split_compound_words(["dampf", "schiff", "fahrt"])
    got = list(_one(spark, chain(whitespace_analyzer(F.col("t"))),
                    "dampfschiff fahrt unrelated dampfschifffahrt"))
    assert got == ["dampf", "schiff", "fahrt", "unrelated",
                   "dampf", "schiff", "fahrt"]


def test_ascii_folding_full(spark):
    from tantivy_spark.analyzer import ascii_fold_word, ascii_folding_full_chain
    # specials the NFD-subset chain cannot fold (no decomposition)
    assert ascii_fold_word("øre") == "ore"
    assert ascii_fold_word("straße") == "strasse"
    assert ascii_fold_word("æther") == "aether"
    assert ascii_fold_word("œuvre") == "oeuvre"
    assert ascii_fold_word("łódź") == "lodz"
    assert ascii_fold_word("ﬁ") == "fi"  # ligature via NFKD
    got = list(_one(spark, ascii_folding_full_chain(F.col("t")),
                    "Łódź cœur naïve"))
    assert got == ["lodz", "coeur", "naive"]


def test_ip_keys_order_preserving(spark):
    """IpAddr keys: lexicographic over keys == numeric over addresses;
    IPv4 JVM path == python ipaddress path; v4-mapped v6 == v4."""
    import ipaddress
    import random

    from tantivy_spark.functions.ip import ip_key, ip_key_col

    rng = random.Random(3)
    v4s = [f"{rng.randrange(256)}.{rng.randrange(256)}."
           f"{rng.randrange(256)}.{rng.randrange(256)}" for _ in range(50)]
    v6s = ["2001:db8::1", "::1", "fe80::aa", "2001:db8::ffff:1"]
    ips = v4s + v6s
    keys = [ip_key(ip) for ip in ips]
    nums = [int(ipaddress.IPv6Address(f"::ffff:{ip}"))
            if ":" not in ip else int(ipaddress.ip_address(ip)) for ip in ips]
    assert sorted(range(len(ips)), key=lambda i: keys[i]) == \
        sorted(range(len(ips)), key=lambda i: nums[i])
    assert ip_key("1.2.3.4") == ip_key("::ffff:1.2.3.4")

    df = spark.createDataFrame([(ip,) for ip in ips], "ip STRING")
    got = {r["ip"]: r["k"] for r in
           df.select("ip", ip_key_col(F.col("ip")).alias("k")).collect()}
    for ip, k in zip(ips, keys):
        assert got[ip] == k, ip


def test_ip_range_filter(spark):
    from tantivy_spark.functions.ip import ip_range_filter

    df = spark.createDataFrame(
        [("10.0.0.1",), ("10.0.5.9",), ("10.1.0.0",), ("9.255.255.255",),
         ("2001:db8::1",), ("10.0.255.255",)], "ip STRING")
    got = sorted(r["ip"] for r in
                 ip_range_filter(df, "ip", "10.0.0.0", "10.0.255.255").collect())
    assert got == ["10.0.0.1", "10.0.255.255", "10.0.5.9"]
    # v6 range
    got6 = sorted(r["ip"] for r in
                  ip_range_filter(df, "ip", "2001:db8::", "2001:db8::ff").collect())
    assert got6 == ["2001:db8::1"]


def test_ip_dirty_input_keys_to_null(spark):
    """Out-of-range octets must NOT take the JVM fast path (lpad would
    truncate the overflowing hex into a colliding key), and unparseable
    strings key to NULL instead of failing the query."""
    from tantivy_spark.functions.ip import ip_key, ip_key_col, ip_range_filter

    df = spark.createDataFrame(
        [("300.1.2.3",), ("999.999.999.999",), ("not-an-ip",), ("1.2.3",),
         ("10.0.0.1",), (None,)], "ip STRING")
    got = {r["ip"]: r["k"] for r in
           df.select("ip", ip_key_col(F.col("ip")).alias("k")).collect()}
    assert got["10.0.0.1"] == ip_key("10.0.0.1")
    for dirty in ("300.1.2.3", "999.999.999.999", "not-an-ip", "1.2.3", None):
        assert got[dirty] is None, (dirty, got[dirty])
    # a range filter over dirty rows neither raises nor matches them
    kept = sorted(r["ip"] for r in
                  ip_range_filter(df, "ip", "0.0.0.0", "255.255.255.255")
                  .collect())
    assert kept == ["10.0.0.1"]


def test_snowball_r04_chains_distributed(spark):
    """The {ro,fi,hu,tr}_stem analyzers run the same stems through the
    Arrow-batched UDF path."""
    from tantivy_spark.analyzer import (
        fi_stem_tokens_col, hu_stem_tokens_col, ro_stem_tokens_col,
        tr_stem_tokens_col)

    got = list(_one(spark, ro_stem_tokens_col(F.col("t")),
                    "lucrurile românească importante"))
    assert got == ["lucrur", "român", "import"]
    got = list(_one(spark, fi_stem_tokens_col(F.col("t")),
                    "taloissa autolla kaupungissa"))
    assert got == ["talo", "auto", "kaupung"]
    got = list(_one(spark, hu_stem_tokens_col(F.col("t")),
                    "házakban almákat könyvek"))
    assert got == ["ház", "alma", "könyv"]
    got = list(_one(spark, tr_stem_tokens_col(F.col("t")),
                    "kitaplar evlerinde okuldaki"))
    assert got == ["kitap", "ev", "okul"]


# Arabic / Greek / Tamil vectors hand-traced through the published
# snowballstem.org algorithm descriptions (r05 — completes the
# reference's 18-language set, stemmer.rs:13,20,29)
SNOWBALL3_VECTORS = {
    "ar": {
        "الكتاب": "كتاب",        # definite article stripped
        "كتابهم": "كتاب",        # possessive pronoun suffix
        "المكتبات": "مكتب",   # article + feminine plural
        "والطلاب": "طلاب",     # conjunction + article
        "يكتبون": "يكتب",        # verb subject suffix
        "سيذهب": "يذهب",            # future marker
        "مدرسة": "مدرس",            # teh marbuta
        "بالقلم": "قلم",          # bi+al prefix
        "يستخدم": "استخدم",   # yst- -> ast-
    },
    "el": {
        "υπολογιστές": "υπολογιστ",   # -ες plural (step 6)
        "ποδήλατα": "ποδηλατ",             # -α plural
        "παιδιά": "παιδ",                         # step 3, consonant stem
        "καλόγερος": "καλογερ",           # -ος
        "αγαπούσε": "αγαπ",                     # step 5h imperfect
        "γεγονότα": "γεγον",                   # step 1 irregular
        "προβλήματα": "προβλημ",         # -ματα -> μα, then -α
        "φώτα": "φω",                                   # step 1 irregular
        # step-5i exception-list regression pins (re-append ΑΓ when the
        # remainder is in the exception set; guards suppress it)
        "χάραγα": "χαραγ",                     # ΧΑΡ in 5i set -> +ΑΓ
        "ναύαγα": "ναυαγ",                     # ΝΑΥ in 5i set -> +ΑΓ
        "πίσταγα": "πιστ",                       # not in set: no re-append
        "κόλλαγα": "κολλ",                       # ΚΟΛΛ-ending guard
        "ψόφαγα": "ψοφ",                           # explicit skip entry
    },
    "ta": {
        "மரங்கள்": "மரம்",              # plural with sandhi reversal
        "புத்தகங்கள்": "புத்தகம்",
        "வீடுகள்": "வீடு",
        "செய்கிறான்": "செய்",  # present tense + person
        "மனிதர்கள்": "மனித",
        "பள்ளியில்": "பள்ளிய",  # locative
    },
}


def test_snowball3_vectors():
    from tantivy_spark.functions.snowball3 import (
        arabic_stem, greek_stem, tamil_stem)

    fns = {"ar": arabic_stem, "el": greek_stem, "ta": tamil_stem}
    for lang, vecs in SNOWBALL3_VECTORS.items():
        for w, want in vecs.items():
            assert fns[lang](w) == want, (lang, w, fns[lang](w))
    # idempotence: stem(stem(w)) == stem(w) for every vector
    for lang, vecs in SNOWBALL3_VECTORS.items():
        for want in vecs.values():
            assert fns[lang](fns[lang](want)) == fns[lang](want)
    # non-native-script words pass through untouched
    for fn in fns.values():
        assert fn("database") == "database"


def test_snowball3_known_divergences():
    """EXECUTABLE pins of the DOCUMENTED deviations from the reference's
    Snowball stemmers (stemmer.rs:13-55 maps Language::Arabic/Greek to
    rust-stemmers; snowball3.py's docstring records where this
    implementation's best offline reconstruction may differ).  These are
    NOT parity assertions — they freeze the CURRENT behavior of the
    affected word classes so any change (a regression OR a deliberate
    fidelity fix from an independent published table) is loud in the
    suite instead of silent prose drift.

    * Arabic: initial hamza-seat normalization applies UNCONDITIONALLY
      before the prefix ladder, where the published algorithm
      interleaves it — prefix+hamza words pin the unconditional order.
    * Greek: the open Ntais step-6 interaction — whether the
      common-endings sweep is gated on 'no earlier step fired'.  This
      implementation does NOT gate it, so a step-5 re-append like
      ΒΕΤΕΡ+ΑΝ is stripped again by step 6 (a gated automaton would
      keep 'βετεραν')."""
    from tantivy_spark.functions.snowball3 import arabic_stem, greek_stem

    # Arabic hamza-before-prefix class (deviation: unconditional seat
    # folding; the interleaved published order could see the hamza form
    # when matching ال/وال/بال prefixes)
    for w, current in [("أطفال", "اطفال"), ("والأطفال", "اطفال"),
                       ("بالإيمان", "ايم"), ("فأكل", "اكل"),
                       ("آفاق", "افاق")]:
        assert arabic_stem(w) == current, (w, arabic_stem(w))

    # Greek step-5/6 interaction class (open question documented in
    # snowball3.py; an ungated step 6 strips the 5-re-appended tail)
    for w, current in [("βετεράν", "βετερ"),       # 5-re-append ΑΝ then 6 strips
                       ("ανέφαγα", "ανεφ"),         # 5i guard path, 6 sweeps
                       ("φάγαμε", "φ")]:            # aggressive sweep extreme
        assert greek_stem(w) == current, (w, greek_stem(w))


def test_snowball3_chains_distributed(spark):
    """The {ar,el}_stem analyzers run the same stems through the
    Arrow-batched UDF path (Tamil splits at combining marks under the
    simple tokenizer — reference parity: Rust char::is_alphanumeric
    excludes marks — so its full-word path is covered above)."""
    from tantivy_spark.analyzer import (
        ar_stem_tokens_col, el_stem_tokens_col)

    got = list(_one(spark, ar_stem_tokens_col(F.col("t")),
                    "الكتاب مدرسة يكتبون"))
    assert got == ["كتاب", "مدرس", "يكتب"]
    got = list(_one(spark, el_stem_tokens_col(F.col("t")),
                    "υπολογιστές παιδιά γεγονότα"))
    assert got == ["υπολογιστ", "παιδ", "γεγον"]


# ---------------------------------------------------------------- ngram
# vectors ported from ngram_tokenizer.rs:360-461

def test_ngram_1_2_all(spark):
    got = list(_one(spark, ngram_tokens(F.col("t"), 1, 2), "hello"))
    assert got == ["h", "he", "e", "el", "l", "ll", "l", "lo", "o"]


def test_ngram_min_max_equal(spark):
    got = list(_one(spark, ngram_tokens(F.col("t"), 3, 3), "hello"))
    assert got == ["hel", "ell", "llo"]


def test_ngram_2_5_prefix(spark):
    got = list(_one(spark, ngram_tokens(F.col("t"), 2, 5,
                                        prefix_only=True), "frankenstein"))
    assert got == ["fr", "fra", "fran", "frank"]


def test_ngram_non_ascii_1_2(spark):
    got = list(_one(spark, ngram_tokens(F.col("t"), 1, 2), "hεllo"))
    assert got == ["h", "hε", "ε", "εl", "l", "ll", "l", "lo", "o"]


def test_ngram_non_ascii_2_5_prefix(spark):
    got = list(_one(spark, ngram_tokens(F.col("t"), 2, 5,
                                        prefix_only=True), "hεllo"))
    assert got == ["hε", "hεl", "hεll", "hεllo"]


def test_ngram_empty(spark):
    assert list(_one(spark, ngram_tokens(F.col("t"), 1, 5), "")) == []
    assert list(_one(spark, ngram_tokens(F.col("t"), 2, 5), "")) == []


def test_ngram_shorter_than_min(spark):
    assert list(_one(spark, ngram_tokens(F.col("t"), 3, 5), "ab")) == []


def test_ngram_invalid_intervals_raise(spark):
    import pytest as _pytest
    with _pytest.raises(ValueError, match="min_gram must be greater"):
        ngram_tokens(F.col("t"), 0, 2)
    with _pytest.raises(ValueError,
                        match="min_gram must not be greater"):
        ngram_tokens(F.col("t"), 2, 1)


# ------------------------------------------------- ascii folding vectors
# ported verbatim from ascii_folding_filter.rs:1569-1646

def test_ascii_folding_reference_vectors():
    from tantivy_spark.analyzer import ascii_fold_word

    def fold_words(s):
        return [ascii_fold_word(w) for w in s.split()]

    assert fold_words("Ràmon") == ["Ramon"]
    assert fold_words("accentué") == ["accentue"]
    assert fold_words("âäàéè") == ["aaaee"]
    assert fold_words("Usagi") == ["Usagi"]          # test_no_change


def test_ascii_folding_latin1_characters():
    """ascii_folding_filter.rs:1602 test_latin1_characters — the full
    Latin-1 supplement + ligature table, case preserved."""
    from tantivy_spark.analyzer import ascii_fold_word

    latin1 = ("Des mot clés À LA CHAÎNE À Á Â Ã Ä Å Æ Ç È É Ê Ë Ì Í Î Ï Ĳ Ð Ñ "
              "Ò Ó Ô Õ Ö Ø Œ Þ Ù Ú Û Ü Ý Ÿ à á â ã ä å æ ç è é ê ë ì í î ï ĳ "
              "ð ñ ò ó ô õ ö ø œ ß þ ù ú û ü ý ÿ ﬁ ﬂ")
    want = (["Des", "mot", "cles", "A", "LA", "CHAINE"]
            + ["A"] * 6 + ["AE"] + ["C"] + ["E"] * 4 + ["I"] * 4 + ["IJ"]
            + ["D"] + ["N"] + ["O"] * 6 + ["OE"] + ["TH"]
            + ["U"] * 4 + ["Y"] * 2
            + ["a"] * 6 + ["ae"] + ["c"] + ["e"] * 4 + ["i"] * 4 + ["ij"]
            + ["d"] + ["n"] + ["o"] * 6 + ["oe"] + ["ss"] + ["th"]
            + ["u"] * 4 + ["y"] * 2 + ["fi", "fl"])
    assert [ascii_fold_word(w) for w in latin1.split()] == want


def test_ascii_folding_unmodified_letters():
    """ascii_folding_filter.rs:1640 — symbols without ASCII equivalents
    pass through untouched (raw-tokenizer chain keeps one token)."""
    from tantivy_spark.analyzer import ascii_fold_word

    assert ascii_fold_word("§ ¦ ¤ END") == "§ ¦ ¤ END"


# ------------------------------------------------- regex tokenizer
# vectors ported from regex_tokenizer.rs tests

def test_regex_tokenizer_quoted_tokens(spark):
    from tantivy_spark.analyzer import regex_tokenizer
    got = list(_one(spark, regex_tokenizer(r"'(?:\w*)'")(F.col("t")),
                    "'aaa' bbb 'ccc' 'ddd'"))
    assert got == ["'aaa'", "'ccc'", "'ddd'"]


def test_regex_tokenizer_no_match_and_empty(spark):
    from tantivy_spark.analyzer import regex_tokenizer
    chain = regex_tokenizer(r"'(?:\w*)'")
    assert list(_one(spark, chain(F.col("t")), "aaa")) == []
    assert list(_one(spark, chain(F.col("t")), "")) == []


def test_regex_tokenizer_invalid_pattern_raises():
    import pytest as _pytest

    from tantivy_spark.analyzer import regex_tokenizer
    with _pytest.raises(ValueError, match="invalid argument"):
        regex_tokenizer(r"\@(")
