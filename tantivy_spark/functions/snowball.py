"""Snowball stemmers beyond English: German, Spanish, French, Italian,
Portuguese, Dutch, Russian.

Implemented from the published Snowball algorithm descriptions
(M.F. Porter's snowball algorithm family, snowballstem.org) — the same
algorithms the reference exposes via rust-stemmers
(/root/reference/src/tokenizer/stemmer.rs:35-75 lists the languages).
Pure Python, used through Arrow-batched pandas UDFs (analyzer.py), so a
worker stems a whole batch per call.

Each stemmer expects a lowercased word (our analyzer lowercases first)
and returns the stem with the language's final tidy-up applied (umlaut
folding for German, accent removal for Spanish, etc.).
"""

from __future__ import annotations

# --------------------------------------------------------------------------
# shared region machinery
# --------------------------------------------------------------------------


def _r_after(word: str, start: int, vowels: str) -> int:
    """Standard Rk definition: position after the first non-vowel that
    follows a vowel, at or after ``start``; len(word) if none."""
    n = len(word)
    i = start
    while i < n and word[i] not in vowels:
        i += 1
    while i < n and word[i] in vowels:
        i += 1
    # i now at first non-vowel after a vowel (or end)
    return min(i + 1, n) if i < n else n


def _std_r1_r2(word: str, vowels: str) -> tuple[int, int]:
    r1 = _r_after(word, 0, vowels)
    r2 = _r_after(word, r1, vowels)
    return r1, r2


def _rv_std(w: str, vowels: str) -> int:
    """The Romance-language RV definition (Spanish/Italian/Portuguese):
    second-letter-consonant -> after the next vowel; two leading vowels ->
    after the next consonant; consonant-vowel -> after the third letter."""
    n = len(w)
    if n < 3:
        return n
    if w[1] not in vowels:
        i = 2
        while i < n and w[i] not in vowels:
            i += 1
        return min(i + 1, n)
    if w[0] in vowels and w[1] in vowels:
        i = 2
        while i < n and w[i] in vowels:
            i += 1
        return min(i + 1, n)
    return 3


# --------------------------------------------------------------------------
# German (snowball german algorithm)
# --------------------------------------------------------------------------

_DE_VOWELS = "aeiouyäöü"
_DE_S_END = "bdfghklmnrt"    # valid s-endings
_DE_ST_END = "bdfghklmnt"    # valid st-endings


def german_stem(word: str) -> str:
    w = word.replace("ß", "ss")
    # mark u/y between vowels as consonants
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and chars[i - 1] in _DE_VOWELS \
                and chars[i + 1] in _DE_VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)

    r1, r2 = _std_r1_r2(w, _DE_VOWELS)  # marked U/Y count as consonants
    # R1 is adjusted so that the region before it has at least 3 letters
    r1 = max(r1, min(3, len(w)))

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # ---- step 1 ----------------------------------------------------------
    done = False
    for suf in ("ern", "em", "er"):
        if w.endswith(suf) and in_r1(len(w) - len(suf)):
            w = w[: -len(suf)]
            done = True
            break
    if not done:
        for suf in ("en", "es", "e"):
            if w.endswith(suf) and in_r1(len(w) - len(suf)):
                w = w[: -len(suf)]
                if w.endswith("niss"):
                    w = w[:-1]
                done = True
                break
    if not done and w.endswith("s") and in_r1(len(w) - 1) \
            and len(w) >= 2 and w[-2] in _DE_S_END:
        w = w[:-1]

    # ---- step 2 ----------------------------------------------------------
    done = False
    for suf in ("est", "en", "er"):
        if w.endswith(suf) and in_r1(len(w) - len(suf)):
            w = w[: -len(suf)]
            done = True
            break
    if not done and w.endswith("st") and in_r1(len(w) - 2) \
            and len(w) >= 6 and w[-3] in _DE_ST_END:
        w = w[:-2]

    # ---- step 3 (d-suffixes) --------------------------------------------
    if w.endswith(("end", "ung")):
        if in_r2(len(w) - 3):
            w = w[:-3]
            if w.endswith("ig") and in_r2(len(w) - 2) and \
                    not w.endswith("eig"):
                w = w[:-2]
    elif w.endswith(("isch",)):
        if in_r2(len(w) - 4) and not w.endswith("eisch"):
            w = w[:-4]
    elif w.endswith(("ig", "ik")):
        if in_r2(len(w) - 2) and (len(w) < 3 or w[-3] != "e"):
            w = w[:-2]
    elif w.endswith(("lich", "heit")):
        if in_r2(len(w) - 4):
            w = w[:-4]
            for pre in ("er", "en"):
                if w.endswith(pre) and in_r1(len(w) - 2):
                    w = w[:-2]
                    break
    elif w.endswith("keit"):
        if in_r2(len(w) - 4):
            w = w[:-4]
            if w.endswith("lich") and in_r2(len(w) - 4):
                w = w[:-4]
            elif w.endswith("ig") and in_r2(len(w) - 2):
                w = w[:-2]

    # ---- finally ---------------------------------------------------------
    out = []
    for c in w:
        if c == "U":
            out.append("u")
        elif c == "Y":
            out.append("y")
        elif c == "ä":
            out.append("a")
        elif c == "ö":
            out.append("o")
        elif c == "ü":
            out.append("u")
        else:
            out.append(c)
    return "".join(out)


# --------------------------------------------------------------------------
# Spanish (snowball spanish algorithm)
# --------------------------------------------------------------------------

_ES_VOWELS = "aeiouáéíóúü"


def _es_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _ES_VOWELS:
        # after the next following vowel
        i = 2
        while i < n and w[i] not in _ES_VOWELS:
            i += 1
        return min(i + 1, n)
    if w[0] in _ES_VOWELS and w[1] in _ES_VOWELS:
        # after the next following consonant
        i = 2
        while i < n and w[i] in _ES_VOWELS:
            i += 1
        return min(i + 1, n)
    # consonant-vowel: after the third letter
    return 3


_ES_PRON = ("selas", "selos", "sela", "selo", "las", "les", "los", "nos",
            "me", "se", "la", "le", "lo")
_ES_PRE_A = ("iéndo", "ándo", "ár", "ér", "ír")
_ES_PRE_B = ("iendo", "ando", "ar", "er", "ir")

_ES_STEP1 = [
    # (suffixes, condition region, action)
    (("amientos", "imientos", "amiento", "imiento", "anzas", "ismos",
      "ables", "ibles", "istas", "anza", "icos", "icas", "ismo", "able",
      "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa"),
     "r2", "delete", None),
    (("adoras", "adores", "aciones", "ancias", "adora", "ación", "antes",
      "ancia", "ador", "ante"), "r2", "delete", ("ic",)),
    (("logías", "logía"), "r2", "log", None),
    (("uciones", "ución"), "r2", "u", None),
    (("encias", "encia"), "r2", "ente", None),
]


def _es_remove_accents(w: str) -> str:
    return (w.replace("á", "a").replace("é", "e").replace("í", "i")
            .replace("ó", "o").replace("ú", "u"))


def spanish_stem(word: str) -> str:
    w = word
    r1, r2 = _std_r1_r2(w, _ES_VOWELS)
    rv = _es_rv(w)

    def in_r1(p):
        return p >= r1

    def in_r2(p):
        return p >= r2

    def in_rv(p):
        return p >= rv

    # ---- step 0: attached pronoun ---------------------------------------
    for pron in _ES_PRON:
        if not w.endswith(pron):
            continue
        base = w[: -len(pron)]
        cut = len(w) - len(pron)
        matched = False
        for pre in _ES_PRE_A:
            if base.endswith(pre) and in_rv(cut - len(pre)):
                w = base[: -len(pre)] + \
                    pre.replace("á", "a").replace("é", "e").replace("í", "i")
                matched = True
                break
        if not matched:
            for pre in _ES_PRE_B:
                if base.endswith(pre) and in_rv(cut - len(pre)):
                    w = base
                    matched = True
                    break
        if not matched and base.endswith("yendo") \
                and in_rv(cut - 5) and base[:-5].endswith("u"):
            w = base
            matched = True
        if matched:
            break

    n0 = len(w)

    # ---- step 1: standard suffixes --------------------------------------
    step1_done = False
    # amente / mente / idad / iva-family need bespoke handling
    if w.endswith("amente") and in_r1(len(w) - 6):
        w = w[:-6]
        step1_done = True
        if w.endswith("iv") and in_r2(len(w) - 2):
            w = w[:-2]
            if w.endswith("at") and in_r2(len(w) - 2):
                w = w[:-2]
        else:
            for pre in ("os", "ic", "ad"):
                if w.endswith(pre) and in_r2(len(w) - 2):
                    w = w[:-2]
                    break
    elif w.endswith("mente") and in_r2(len(w) - 5):
        w = w[:-5]
        step1_done = True
        for pre in ("ante", "able", "ible"):
            if w.endswith(pre) and in_r2(len(w) - 4):
                w = w[:-4]
                break
    elif w.endswith(("idades", "idad")):
        suf = "idades" if w.endswith("idades") else "idad"
        if in_r2(len(w) - len(suf)):
            w = w[: -len(suf)]
            step1_done = True
            for pre in ("abil", "ic", "iv"):
                if w.endswith(pre) and in_r2(len(w) - len(pre)):
                    w = w[: -len(pre)]
                    break
    elif w.endswith(("ivas", "ivos", "iva", "ivo")):
        suf = next(s for s in ("ivas", "ivos", "iva", "ivo") if w.endswith(s))
        if in_r2(len(w) - len(suf)):
            w = w[: -len(suf)]
            step1_done = True
            if w.endswith("at") and in_r2(len(w) - 2):
                w = w[:-2]
    else:
        for sufs, region, action, also in _ES_STEP1:
            hit = next((s for s in sufs if w.endswith(s)), None)
            if hit is None:
                continue
            pos = len(w) - len(hit)
            ok = in_r2(pos) if region == "r2" else in_r1(pos)
            if not ok:
                break
            if action == "delete":
                w = w[:pos]
                if also:
                    for pre in also:
                        if w.endswith(pre) and in_r2(len(w) - len(pre)):
                            w = w[: -len(pre)]
                            break
            else:
                w = w[:pos] + action
            step1_done = True
            break
    if len(w) != n0:
        step1_done = True

    # ---- step 2a: verb suffixes beginning y ------------------------------
    step2a_done = False
    if not step1_done:
        for suf in ("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas",
                    "yes", "ya", "ye", "yo", "yó"):
            pos = len(w) - len(suf)
            if w.endswith(suf) and in_rv(pos) and pos >= 1 and w[pos - 1] == "u":
                w = w[:pos]
                step2a_done = True
                break

    # ---- step 2b: other verb suffixes ------------------------------------
    if not step1_done and not step2a_done:
        gu_group = ("emos", "éis", "en", "es")
        big = ("aríamos", "eríamos", "iríamos", "iéramos", "iésemos",
               "aríais", "aseis", "eríais", "ieseis", "asteis", "iríais",
               "ierais", "isteis", "áramos", "ábamos", "ásemos",
               "arían", "arías", "aréis", "erían", "erías", "eréis",
               "irían", "irías", "iréis", "ieran", "iesen", "ieron",
               "iendo", "ieras", "ieses", "abais", "arais", "íamos",
               "aremos", "eremos", "iremos",
               "arán", "arás", "aría", "erán", "erás", "ería", "irán",
               "irás", "iría", "iera", "iese", "aste", "iste", "aban",
               "aran", "asen", "aron", "ando", "abas", "adas", "idas",
               "aras", "ases", "íais", "ados", "idos", "amos", "imos",
               "ará", "aré", "erá", "eré", "irá", "iré", "aba", "ada",
               "ida", "ara", "ase", "ían", "ado", "ido", "ías", "áis",
               "ía", "ad", "ed", "id", "an", "ió", "ar", "er", "ir", "as",
               "ís")
        matched = None
        for suf in sorted(gu_group + big, key=len, reverse=True):
            if w.endswith(suf) and in_rv(len(w) - len(suf)):
                matched = suf
                break
        if matched:
            w = w[: -len(matched)]
            if matched in gu_group and w.endswith("gu"):
                w = w[:-1]

    # ---- step 3: residual suffix ------------------------------------------
    for suf in ("os", "a", "o", "á", "í", "ó"):
        if w.endswith(suf) and in_rv(len(w) - len(suf)):
            w = w[: -len(suf)]
            break
    else:
        if w.endswith(("e", "é")) and in_rv(len(w) - 1):
            w = w[:-1]
            if w.endswith("gu") and in_rv(len(w) - 1):
                w = w[:-1]

    return _es_remove_accents(w)


# --------------------------------------------------------------------------
# French (snowball french algorithm)
# --------------------------------------------------------------------------

_FR_VOWELS = "aeiouyâàëéêèïîôûù"


def _fr_prelude(w: str) -> str:
    chars = list(w)
    n = len(chars)

    def is_v(i):
        return 0 <= i < n and chars[i] in _FR_VOWELS

    for i in range(n):
        c = chars[i]
        if c in "ui" and is_v(i - 1) and is_v(i + 1):
            chars[i] = c.upper()
        elif c == "y" and (is_v(i - 1) or is_v(i + 1)):
            chars[i] = "Y"
        elif c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
    return "".join(chars)


def _fr_rv(w: str) -> int:
    n = len(w)
    if n >= 3 and w[0] in _FR_VOWELS and w[1] in _FR_VOWELS:
        return 3
    for pre in ("par", "col", "tap"):
        if w.startswith(pre):
            return 3
    # region after the first vowel not at the start
    for i in range(1, n):
        if w[i] in _FR_VOWELS:
            return min(i + 1, n)
    return n


def french_stem(word: str) -> str:
    w = _fr_prelude(word)
    r1, r2 = _std_r1_r2(w, _FR_VOWELS)
    rv = _fr_rv(w)

    def in_r1(p):
        return p >= r1

    def in_r2(p):
        return p >= r2

    def in_rv(p):
        return p >= rv

    orig = w
    step1_changed = False
    found_ment = False

    # ---- step 1: standard suffixes (longest match) -----------------------
    sufs = sorted([
        "ances", "iqUes", "ismes", "ables", "istes", "ance", "iqUe", "isme",
        "able", "iste", "eux", "atrices", "ateurs", "ations", "atrice",
        "ateur", "ation", "logies", "logie", "usions", "utions", "usion",
        "ution", "ences", "ence", "ements", "ement", "ités", "ité",
        "ives", "ifs", "ive", "if", "eaux", "aux", "euses", "euse",
        "issements", "issement", "amment", "emment", "ments", "ment",
    ], key=len, reverse=True)
    for suf in sufs:
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if suf in ("ances", "ance", "iqUes", "iqUe", "ismes", "isme",
                   "ables", "able", "istes", "iste", "eux"):
            if in_r2(pos):
                w = w[:pos]
                step1_changed = True
        elif suf in ("atrices", "ateurs", "ations", "atrice", "ateur", "ation"):
            if in_r2(pos):
                w = w[:pos]
                step1_changed = True
                if w.endswith("ic"):
                    if in_r2(len(w) - 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif suf in ("logies", "logie"):
            if in_r2(pos):
                w = w[:pos] + "log"
                step1_changed = True
        elif suf in ("usions", "utions", "usion", "ution"):
            if in_r2(pos):
                w = w[:pos] + "u"
                step1_changed = True
        elif suf in ("ences", "ence"):
            if in_r2(pos):
                w = w[:pos] + "ent"
                step1_changed = True
        elif suf in ("issements", "issement"):
            if pos >= 1 and w[pos - 1] not in _FR_VOWELS and in_r1(pos):
                w = w[:pos]
                step1_changed = True
        elif suf in ("ements", "ement"):
            if in_rv(pos):
                w = w[:pos]
                step1_changed = True
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif w.endswith("eus"):
                    p2 = len(w) - 3
                    if in_r2(p2):
                        w = w[:p2]
                    elif in_r1(p2):
                        w = w[:p2] + "eux"
                elif w.endswith(("abl", "iqU")) and in_r2(len(w) - 3):
                    w = w[:-3]
                elif w.endswith(("ièr", "Ièr")) and in_rv(len(w) - 3):
                    w = w[:-3] + "i"
        elif suf in ("ités", "ité"):
            if in_r2(pos):
                w = w[:pos]
                step1_changed = True
                if w.endswith("abil"):
                    p2 = len(w) - 4
                    if in_r2(p2):
                        w = w[:p2]
                    else:
                        w = w[:p2] + "abl"
                elif w.endswith("ic"):
                    p2 = len(w) - 2
                    if in_r2(p2):
                        w = w[:p2]
                    else:
                        w = w[:p2] + "iqU"
                elif w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in ("ives", "ifs", "ive", "if"):
            if in_r2(pos):
                w = w[:pos]
                step1_changed = True
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("ic"):
                        p2 = len(w) - 2
                        if in_r2(p2):
                            w = w[:p2]
                        else:
                            w = w[:p2] + "iqU"
        elif suf == "eaux":
            w = w[:pos] + "eau"
            step1_changed = True
        elif suf == "aux":
            if in_r1(pos):
                w = w[:pos] + "al"
                step1_changed = True
        elif suf in ("euses", "euse"):
            if in_r2(pos):
                w = w[:pos]
                step1_changed = True
            elif in_r1(pos):
                w = w[:pos] + "eux"
                step1_changed = True
        elif suf in ("amment",):
            if in_rv(pos):
                w = w[:pos] + "ant"
                found_ment = True
        elif suf in ("emment",):
            if in_rv(pos):
                w = w[:pos] + "ent"
                found_ment = True
        elif suf in ("ments", "ment"):
            if pos >= 1 and (w[pos - 1] in _FR_VOWELS or w[pos - 1] in "UIY") \
                    and in_rv(pos - 1):
                w = w[:pos]
                found_ment = True
        break

    do_step2 = (not step1_changed) or found_ment

    # ---- step 2a: verb suffixes beginning i ------------------------------
    step2a_done = False
    if do_step2:
        i_sufs = sorted(["îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira",
                         "irai", "iraIent", "irais", "irait", "iras", "irent",
                         "irez", "iriez", "irions", "irons", "iront", "is",
                         "issaIent", "issais", "issait", "issant", "issante",
                         "issantes", "issants", "isse", "issent", "isses",
                         "issez", "issiez", "issions", "issons", "it"],
                        key=len, reverse=True)
        for suf in i_sufs:
            pos = len(w) - len(suf)
            if w.endswith(suf) and in_rv(pos) and pos >= 1 \
                    and w[pos - 1] not in _FR_VOWELS and in_rv(pos - 1):
                w = w[:pos]
                step2a_done = True
                step1_changed = True
                break

    # ---- step 2b: other verb suffixes (longest match, no backtracking) --
    if do_step2 and not step2a_done:
        e_group = ("é", "ée", "ées", "és", "èrent", "er", "era", "erai",
                   "eraIent", "erais", "erait", "eras", "erez", "eriez",
                   "erions", "erons", "eront", "ez", "iez")
        a_group = ("a", "ai", "aIent", "ais", "ait", "ant", "ante", "antes",
                   "ants", "as", "asse", "assent", "asses", "assiez",
                   "assions", "âmes", "ât", "âtes")
        b_sufs = sorted(e_group + a_group + ("ions",), key=len, reverse=True)
        for suf in b_sufs:
            if not w.endswith(suf):
                continue
            pos = len(w) - len(suf)
            if not in_rv(pos):
                break  # longest match found but outside RV: step fails
            if suf == "ions":
                if in_r2(pos):
                    w = w[:pos]
                    step1_changed = True
            elif suf in e_group:
                w = w[:pos]
                step1_changed = True
            else:
                # the a-group: delete; a preceding e (in RV) also deletes
                w = w[:pos]
                step1_changed = True
                if w.endswith("e") and in_rv(len(w) - 1):
                    w = w[:-1]
            break

    # ---- step 3 / step 4 --------------------------------------------------
    if step1_changed:
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4: residual suffixes
        if w.endswith("s") and len(w) >= 2 and w[-2] not in "aiouès":
            w = w[:-1]
        if w.endswith("ion") and in_r2(len(w) - 3) and len(w) >= 4 \
                and w[-4] in "st":
            w = w[:-3]
        elif w.endswith(("ier", "ière", "Ier", "Ière")):
            for suf in ("ière", "Ière", "ier", "Ier"):
                if w.endswith(suf) and in_rv(len(w) - len(suf)):
                    w = w[: -len(suf)] + "i"
                    break
        elif w.endswith("e") and in_rv(len(w) - 1):
            w = w[:-1]
        elif w.endswith("ë") and len(w) >= 3 and w[-3:-1] == "gu" \
                and in_rv(len(w) - 1):
            w = w[:-1]

    # ---- step 5: undouble -------------------------------------------------
    for end in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(end):
            w = w[:-1]
            break

    # ---- step 6: un-accent ------------------------------------------------
    i = len(w) - 1
    seen_non_vowel = False
    while i >= 0:
        if w[i] in _FR_VOWELS or w[i] in "UIY":
            if seen_non_vowel and w[i] in "éè":
                w = w[:i] + "e" + w[i + 1:]
            break
        seen_non_vowel = True
        i -= 1

    # postlude
    return w.replace("I", "i").replace("U", "u").replace("Y", "y")


# --------------------------------------------------------------------------
# Italian (snowball italian algorithm)
# --------------------------------------------------------------------------

_IT_VOWELS = "aeiouàèìòù"

_IT_PRON = sorted(
    ["ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
     "sene", "gliela", "gliele", "glieli", "glielo", "gliene",
     "mela", "mele", "meli", "melo", "mene", "tela", "tele", "teli",
     "telo", "tene", "cela", "cele", "celi", "celo", "cene",
     "vela", "vele", "veli", "velo", "vene"], key=len, reverse=True)

_IT_STEP2 = sorted(
    ["ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
     "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano",
     "avate", "avi", "avo", "emmo", "enda", "ende", "endi", "endo",
     "erà", "erai", "eranno", "ere", "erebbe", "erebbero", "erei",
     "eremmo", "eremo", "ereste", "eresti", "erete", "erò", "erono",
     "essero", "ete", "eva", "evamo", "evano", "evate", "evi", "evo",
     "Yamo", "iamo", "immo", "irà", "irai", "iranno", "ire", "irebbe",
     "irebbero", "irei", "iremmo", "iremo", "ireste", "iresti", "irete",
     "irò", "irono", "isca", "iscano", "isce", "isci", "isco", "iscono",
     "issero", "ita", "ite", "iti", "ito", "iva", "ivamo", "ivano",
     "ivate", "ivi", "ivo", "ono", "uta", "ute", "uti", "uto",
     "ar", "ir"], key=len, reverse=True)


def italian_stem(word: str) -> str:
    # prelude: acute -> grave; mark u after q and i/u between vowels
    w = (word.replace("á", "à").replace("é", "è").replace("í", "ì")
         .replace("ó", "ò").replace("ú", "ù"))
    chars = list(w)
    n = len(chars)
    for i in range(n):
        if chars[i] == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
        elif chars[i] in "iu" and 0 < i < n - 1 \
                and chars[i - 1] in _IT_VOWELS and chars[i + 1] in _IT_VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)

    r1, r2 = _std_r1_r2(w, _IT_VOWELS)
    rv = _rv_std(w, _IT_VOWELS)

    def in_r1(p):
        return p >= r1

    def in_r2(p):
        return p >= r2

    def in_rv(p):
        return p >= rv

    # ---- step 0: attached pronoun ----------------------------------------
    for pron in _IT_PRON:
        if not w.endswith(pron):
            continue
        base = w[: -len(pron)]
        cut = len(w) - len(pron)
        if any(base.endswith(g) and in_rv(cut - 4) for g in ("ando", "endo")):
            w = base
        elif any(base.endswith(g) and in_rv(cut - 2)
                 for g in ("ar", "er", "ir")):
            w = base + "e"
        break

    n0 = len(w)

    # ---- step 1: standard suffixes (longest match) ------------------------
    basic_r2 = ("anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi",
                "ismo", "ismi", "abile", "abili", "ibile", "ibili", "ista",
                "iste", "isti", "istà", "istè", "istì", "oso", "osi", "osa",
                "ose", "mente", "atrice", "atrici", "ante", "anti")
    all_s1 = sorted(basic_r2 + ("azione", "azioni", "atore", "atori",
                                "logia", "logie", "uzione", "uzioni",
                                "usione", "usioni", "enza", "enze",
                                "amento", "amenti", "imento", "imenti",
                                "amente", "ità", "ivo", "ivi", "iva", "ive"),
                    key=len, reverse=True)
    for suf in all_s1:
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if suf in ("amento", "amenti", "imento", "imenti"):
            if in_rv(pos):
                w = w[:pos]
        elif suf == "amente":
            if in_r1(pos):
                w = w[:pos]
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                else:
                    for pre in ("os", "ic"):
                        if w.endswith(pre) and in_r2(len(w) - 2):
                            w = w[:-2]
                            break
                    else:
                        if w.endswith("abil") and in_r2(len(w) - 4):
                            w = w[:-4]
        elif suf in ("azione", "azioni", "atore", "atori"):
            if in_r2(pos):
                w = w[:pos]
                if w.endswith("ic") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in ("logia", "logie"):
            if in_r2(pos):
                w = w[:pos] + "log"
        elif suf in ("uzione", "uzioni", "usione", "usioni"):
            if in_r2(pos):
                w = w[:pos] + "u"
        elif suf in ("enza", "enze"):
            if in_r2(pos):
                w = w[:pos] + "ente"
        elif suf == "ità":
            if in_r2(pos):
                w = w[:pos]
                if w.endswith("abil") and in_r2(len(w) - 4):
                    w = w[:-4]
                elif w.endswith(("ic", "iv")) and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in ("ivo", "ivi", "iva", "ive"):
            if in_r2(pos):
                w = w[:pos]
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("ic") and in_r2(len(w) - 2):
                        w = w[:-2]
        else:  # basic_r2
            if in_r2(pos):
                w = w[:pos]
        break

    # ---- step 2: verb suffixes (only if step 1 removed nothing) -----------
    if len(w) == n0:
        for suf in _IT_STEP2:
            if w.endswith(suf) and in_rv(len(w) - len(suf)):
                w = w[: -len(suf)]
                break

    # ---- step 3a: residual vowel ------------------------------------------
    if w and w[-1] in "aeioàèìò" and in_rv(len(w) - 1):
        w = w[:-1]
        if w.endswith("i") and in_rv(len(w) - 1):
            w = w[:-1]

    # ---- step 3b: ch/gh ----------------------------------------------------
    if w.endswith(("ch", "gh")) and in_rv(len(w) - 2):
        w = w[:-1]

    return w.replace("I", "i").replace("U", "u")


# --------------------------------------------------------------------------
# Portuguese (snowball portuguese algorithm)
# --------------------------------------------------------------------------

_PT_VOWELS = "aeiouáéíóúâêô"

_PT_STEP2 = sorted(
    ["ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá",
     "era", "irá", "ava", "asse", "esse", "isse", "aste", "este", "iste",
     "ei", "arei", "erei", "irei", "am", "iam", "ariam", "eriam", "iriam",
     "aram", "eram", "iram", "avam", "em", "arem", "erem", "irem",
     "assem", "essem", "issem", "ado", "ido", "ando", "endo", "indo",
     "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as", "adas", "idas",
     "ias", "arias", "erias", "irias", "arás", "aras", "erás", "eras",
     "irás", "avas", "es", "ardes", "erdes", "irdes", "ares", "eres",
     "ires", "asses", "esses", "isses", "astes", "estes", "istes", "is",
     "ais", "iais", "ariais", "eriais", "iriais", "áreis", "areis",
     "éreis", "ereis", "íreis", "ireis", "ásseis", "ésseis", "ísseis",
     "áveis", "ados", "idos", "ámos", "amos", "íamos", "aríamos",
     "eríamos", "iríamos", "áramos", "éramos", "íramos", "ávamos",
     "emos", "aremos", "eremos", "iremos", "ássemos", "êssemos",
     "íssemos", "imos", "armos", "ermos", "irmos", "eu", "iu", "ou",
     "ira", "iras"], key=len, reverse=True)


def portuguese_stem(word: str) -> str:
    # prelude: nasalised vowels marked as vowel + tilde-consonant
    w = word.replace("ã", "a~").replace("õ", "o~")
    r1, r2 = _std_r1_r2(w, _PT_VOWELS)
    rv = _rv_std(w, _PT_VOWELS)

    def in_r1(p):
        return p >= r1

    def in_r2(p):
        return p >= r2

    def in_rv(p):
        return p >= rv

    n0 = len(w)

    # ---- step 1: standard suffixes (longest match) ------------------------
    basic_r2 = ("eza", "ezas", "ico", "ica", "icos", "icas", "ismo",
                "ismos", "ável", "ível", "ista", "istas", "oso", "osa",
                "osos", "osas", "amento", "amentos", "imento", "imentos",
                "adora", "ador", "aça~o", "adoras", "adores", "aço~es",
                "ante", "antes", "ância")
    all_s1 = sorted(basic_r2 + ("logia", "logias", "uça~o", "uço~es",
                                "ência", "ências", "amente", "mente",
                                "idade", "idades", "iva", "ivo", "ivas",
                                "ivos", "ira", "iras"),
                    key=len, reverse=True)
    for suf in all_s1:
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if suf in ("logia", "logias"):
            if in_r2(pos):
                w = w[:pos] + "log"
        elif suf in ("uça~o", "uço~es"):
            if in_r2(pos):
                w = w[:pos] + "u"
        elif suf in ("ência", "ências"):
            if in_r2(pos):
                w = w[:pos] + "ente"
        elif suf == "amente":
            if in_r1(pos):
                w = w[:pos]
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if w.endswith(pre) and in_r2(len(w) - 2):
                            w = w[:-2]
                            break
        elif suf == "mente":
            if in_r2(pos):
                w = w[:pos]
                for pre in ("ante", "avel", "ível"):
                    if w.endswith(pre) and in_r2(len(w) - 4):
                        w = w[:-4]
                        break
        elif suf in ("idade", "idades"):
            if in_r2(pos):
                w = w[:pos]
                if w.endswith("abil") and in_r2(len(w) - 4):
                    w = w[:-4]
                elif w.endswith(("ic", "iv")) and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in ("iva", "ivo", "ivas", "ivos"):
            if in_r2(pos):
                w = w[:pos]
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in ("ira", "iras"):
            if in_rv(pos) and pos >= 1 and w[pos - 1] == "e":
                w = w[:pos] + "ir"
        else:  # basic_r2
            if in_r2(pos):
                w = w[:pos]
        break

    step1_changed = len(w) != n0
    step2_changed = False

    # ---- step 2: verb suffixes (only if step 1 removed nothing) -----------
    if not step1_changed:
        for suf in _PT_STEP2:
            if w.endswith(suf) and in_rv(len(w) - len(suf)):
                w = w[: -len(suf)]
                step2_changed = True
                break

    # ---- step 3 / step 4 ---------------------------------------------------
    if step1_changed or step2_changed:
        if w.endswith("i") and in_rv(len(w) - 1) and len(w) >= 2 \
                and w[-2] == "c":
            w = w[:-1]
    else:
        for suf in ("os", "a", "i", "o", "á", "í", "ó"):
            if w.endswith(suf) and in_rv(len(w) - len(suf)):
                w = w[: -len(suf)]
                break

    # ---- step 5: final e / cedilla ----------------------------------------
    if w and w[-1] in "eéê" and in_rv(len(w) - 1):
        w = w[:-1]
        if (w.endswith("gu") and in_rv(len(w) - 1)) or \
                (w.endswith("ci") and in_rv(len(w) - 1)):
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")


# --------------------------------------------------------------------------
# Dutch (snowball dutch algorithm)
# --------------------------------------------------------------------------

_NL_VOWELS = "aeiouyè"


def _nl_undouble(w: str) -> str:
    return w[:-1] if w.endswith(("kk", "dd", "tt")) else w


def dutch_stem(word: str) -> str:
    # prelude: fold umlauts/acutes, mark y/i consonantal uses
    w = word
    for src, dst in (("ä", "a"), ("ë", "e"), ("ï", "i"), ("ö", "o"),
                     ("ü", "u"), ("á", "a"), ("é", "e"), ("í", "i"),
                     ("ó", "o"), ("ú", "u")):
        w = w.replace(src, dst)
    chars = list(w)
    n = len(chars)
    for i in range(n):
        if chars[i] == "y" and (i == 0 or chars[i - 1] in _NL_VOWELS):
            chars[i] = "Y"
        elif chars[i] == "i" and 0 < i < n - 1 \
                and chars[i - 1] in _NL_VOWELS and chars[i + 1] in _NL_VOWELS:
            chars[i] = "I"
    w = "".join(chars)

    r1, r2 = _std_r1_r2(w, _NL_VOWELS)
    r1 = max(r1, min(3, len(w)))

    def in_r1(p):
        return p >= r1

    def in_r2(p):
        return p >= r2

    def del_en(v: str) -> str:
        """Shared en/ene deletion: valid en-ending = non-vowel, not gem."""
        for suf in ("ene", "en"):
            pos = len(v) - len(suf)
            if v.endswith(suf) and in_r1(pos) and pos >= 1 \
                    and v[pos - 1] not in _NL_VOWELS \
                    and not v[:pos].endswith("gem"):
                return _nl_undouble(v[:pos])
        return v

    # ---- step 1 ------------------------------------------------------------
    if w.endswith("heden") and in_r1(len(w) - 5):
        w = w[:-5] + "heid"
    else:
        w2 = del_en(w)
        if w2 != w:
            w = w2
        else:
            for suf in ("se", "s"):
                pos = len(w) - len(suf)
                if w.endswith(suf) and in_r1(pos) and pos >= 1 \
                        and w[pos - 1] not in _NL_VOWELS and w[pos - 1] != "j":
                    w = w[:pos]
                    break

    # ---- step 2: final e --------------------------------------------------
    e_found = False
    if w.endswith("e") and in_r1(len(w) - 1) and len(w) >= 2 \
            and w[-2] not in _NL_VOWELS:
        e_found = True
        w = _nl_undouble(w[:-1])

    # ---- step 3a: heid ----------------------------------------------------
    if w.endswith("heid") and in_r2(len(w) - 4) and \
            (len(w) < 5 or w[-5] != "c"):
        w = w[:-4]
        w = del_en(w)

    # ---- step 3b: d-suffixes (longest match) -------------------------------
    for suf in ("lijk", "baar", "end", "ing", "bar", "ig"):
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if suf in ("end", "ing"):
            if in_r2(pos):
                w = w[:pos]
                if w.endswith("ig") and in_r2(len(w) - 2) and \
                        (len(w) < 3 or w[-3] != "e"):
                    w = w[:-2]
                else:
                    w = _nl_undouble(w)
        elif suf == "ig":
            if in_r2(pos) and (pos < 1 or w[pos - 1] != "e"):
                w = w[:pos]
        elif suf == "lijk":
            if in_r2(pos):
                w = w[:pos]
                # repeat step 2
                if w.endswith("e") and in_r1(len(w) - 1) and len(w) >= 2 \
                        and w[-2] not in _NL_VOWELS:
                    w = _nl_undouble(w[:-1])
        elif suf == "baar":
            if in_r2(pos):
                w = w[:pos]
        elif suf == "bar":
            if in_r2(pos) and e_found:
                w = w[:pos]
        break

    # ---- step 4: undouble vowel --------------------------------------------
    if len(w) >= 4 and w[-1] not in _NL_VOWELS and w[-1] != "I" \
            and w[-2] == w[-3] and w[-2] in "aeou" \
            and w[-4] not in _NL_VOWELS:
        w = w[:-2] + w[-1]

    return w.replace("Y", "y").replace("I", "i")


# --------------------------------------------------------------------------
# Russian (snowball russian algorithm)
# --------------------------------------------------------------------------

_RU_VOWELS = "аеиоуыэюя"

_RU_PERFECTIVE_1 = ("вшись", "вши", "в")                # preceded by а/я
_RU_PERFECTIVE_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_RU_REFLEXIVE = ("ся", "сь")
_RU_ADJECTIVE = ("ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый",
                 "ой", "ем", "им", "ым", "ом", "его", "ого", "ему", "ому",
                 "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею")
_RU_PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")        # preceded by а/я
_RU_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_RU_VERB_1 = ("ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло",
              "но", "ет", "ют", "ны", "ть", "ешь", "нно")  # preceded by а/я
_RU_VERB_2 = ("ила", "ыла", "ена", "ейте", "уйте", "ите", "или", "ыли",
              "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ило", "ыло",
              "ено", "ят", "ует", "уют", "ит", "ыт", "ены", "ить", "ыть",
              "ишь", "ую", "ю")
_RU_NOUN = ("а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи",
            "ии", "и", "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием",
            "ем", "ам", "ом", "о", "у", "ах", "иях", "ях", "ы", "ь",
            "ию", "ью", "ю", "ия", "ья", "я")


def _ru_remove(w: str, rv: int, plain: tuple, preceded: tuple = ()) -> str | None:
    """Longest-match removal within RV; ``preceded`` suffixes require а/я
    immediately before (the а/я is retained).  None if nothing matched."""
    best = None  # (total_len, cut_pos)
    for suf in plain:
        pos = len(w) - len(suf)
        if w.endswith(suf) and pos >= rv:
            if best is None or len(suf) > best[0]:
                best = (len(suf), pos)
    for suf in preceded:
        pos = len(w) - len(suf)
        if w.endswith(suf) and pos >= 1 and w[pos - 1] in "ая" \
                and pos - 1 >= rv:
            if best is None or len(suf) + 1 > best[0]:
                best = (len(suf) + 1, pos)
    return w[: best[1]] if best else None


def russian_stem(word: str) -> str:
    w = word.replace("ё", "е")
    n = len(w)
    rv = n
    for i in range(n):
        if w[i] in _RU_VOWELS:
            rv = i + 1
            break
    r1, r2 = _std_r1_r2(w, _RU_VOWELS)

    # ---- step 1 -------------------------------------------------------------
    out = _ru_remove(w, rv, _RU_PERFECTIVE_2, _RU_PERFECTIVE_1)
    if out is not None:
        w = out
    else:
        out = _ru_remove(w, rv, _RU_REFLEXIVE)
        if out is not None:
            w = out
        out = _ru_remove(w, rv, _RU_ADJECTIVE)
        if out is not None:
            w = out
            out = _ru_remove(w, rv, _RU_PARTICIPLE_2, _RU_PARTICIPLE_1)
            if out is not None:
                w = out
        else:
            out = _ru_remove(w, rv, _RU_VERB_2, _RU_VERB_1)
            if out is not None:
                w = out
            else:
                out = _ru_remove(w, rv, _RU_NOUN)
                if out is not None:
                    w = out

    # ---- step 2: final и ------------------------------------------------------
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # ---- step 3: derivational (R2) ---------------------------------------------
    for suf in ("ость", "ост"):
        if w.endswith(suf) and len(w) - len(suf) >= r2:
            w = w[: -len(suf)]
            break

    # ---- step 4 ------------------------------------------------------------------
    if w.endswith("нн") and len(w) - 1 >= rv:
        w = w[:-1]
    else:
        out = _ru_remove(w, rv, ("ейше", "ейш"))
        if out is not None:
            w = out
            if w.endswith("нн") and len(w) - 1 >= rv:
                w = w[:-1]
        elif w.endswith("ь") and len(w) - 1 >= rv:
            w = w[:-1]
    return w


# --------------------------------------------------------------------------
# Danish (snowball danish algorithm)
# --------------------------------------------------------------------------

_DA_VOWELS = "aeiouyæåø"
_DA_S_END = "abcdfghjklmnoprtvyzå"

_DA_STEP1 = sorted(
    ["hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
     "erne", "ere", "en", "heden", "eren", "er", "heder", "erer",
     "heds", "es", "endes", "erendes", "enes", "ernes", "eres", "ens",
     "hedens", "erens", "ers", "ets", "erets", "et", "eret"],
    key=len, reverse=True)


def _scand_r1(w: str, vowels: str) -> int:
    r1 = _r_after(w, 0, vowels)
    return max(r1, min(3, len(w)))


def danish_stem(word: str) -> str:
    w = word
    r1 = _scand_r1(w, _DA_VOWELS)

    def in_r1(p):
        return p >= r1

    # ---- step 1: main suffixes (longest match incl. the s-rule) ----------
    for suf in _DA_STEP1:
        pos = len(w) - len(suf)
        if w.endswith(suf) and in_r1(pos):
            w = w[:pos]
            break
    else:
        if w.endswith("s") and in_r1(len(w) - 1) and len(w) >= 2 \
                and w[-2] in _DA_S_END:
            w = w[:-1]

    # ---- step 2: consonant pair tail --------------------------------------
    if w.endswith(("gd", "dt", "gt", "kt")) and in_r1(len(w) - 1):
        w = w[:-1]

    # ---- step 3 -------------------------------------------------------------
    if w.endswith("igst"):
        w = w[:-2]
    for suf in ("elig", "lig", "els", "ig"):
        pos = len(w) - len(suf)
        if w.endswith(suf) and in_r1(pos):
            w = w[:pos]
            # repeat step 2
            if w.endswith(("gd", "dt", "gt", "kt")) and in_r1(len(w) - 1):
                w = w[:-1]
            break
    else:
        if w.endswith("løst") and in_r1(len(w) - 1):
            w = w[:-1]

    # ---- step 4: undouble consonants ---------------------------------------
    if len(w) >= 2 and w[-1] == w[-2] and w[-1] not in _DA_VOWELS \
            and in_r1(len(w) - 1):
        w = w[:-1]
    return w


# --------------------------------------------------------------------------
# Norwegian (snowball norwegian algorithm)
# --------------------------------------------------------------------------

_NO_VOWELS = "aeiouyæåø"
_NO_S_END = "bcdfghjlmnoprtvyz"

_NO_STEP1 = sorted(
    ["a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
     "heten", "ar", "er", "heter", "as", "es", "edes", "endes", "enes",
     "hetenes", "ens", "hetens", "ers", "ets", "et", "het", "ast"],
    key=len, reverse=True)


def norwegian_stem(word: str) -> str:
    w = word
    r1 = _scand_r1(w, _NO_VOWELS)

    def in_r1(p):
        return p >= r1

    # ---- step 1 (longest among main, erte/ert, s-rule) --------------------
    cands = []
    for suf in _NO_STEP1:
        pos = len(w) - len(suf)
        if w.endswith(suf) and in_r1(pos):
            cands.append((len(suf), "del", pos))
            break
    for suf in ("erte", "ert"):
        pos = len(w) - len(suf)
        if w.endswith(suf) and in_r1(pos):
            cands.append((len(suf), "er", pos))
            break
    if w.endswith("s") and in_r1(len(w) - 1) and len(w) >= 2 and \
            (w[-2] in _NO_S_END or
             (w[-2] == "k" and (len(w) < 3 or w[-3] not in _NO_VOWELS))):
        cands.append((1, "del", len(w) - 1))
    if cands:
        _l, action, pos = max(cands)
        w = w[:pos] + ("er" if action == "er" else "")

    # ---- step 2 -------------------------------------------------------------
    if w.endswith(("dt", "vt")) and in_r1(len(w) - 1):
        w = w[:-1]

    # ---- step 3 -------------------------------------------------------------
    for suf in sorted(["leg", "eleg", "ig", "eig", "lig", "elig", "els",
                       "lov", "elov", "slov", "hetslov"],
                      key=len, reverse=True):
        pos = len(w) - len(suf)
        if w.endswith(suf) and in_r1(pos):
            w = w[:pos]
            break
    return w


# --------------------------------------------------------------------------
# Swedish (snowball swedish algorithm)
# --------------------------------------------------------------------------

_SV_VOWELS = "aeiouyäåö"
_SV_S_END = "bcdfghjklmnoprtvy"

_SV_STEP1 = sorted(
    ["a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
     "arne", "are", "aste", "en", "anden", "aren", "heten", "ern", "ar",
     "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es", "ades",
     "andes", "ens", "arens", "hetens", "erns", "at", "andet", "het",
     "ast"], key=len, reverse=True)


def swedish_stem(word: str) -> str:
    w = word
    r1 = _scand_r1(w, _SV_VOWELS)

    def in_r1(p):
        return p >= r1

    # ---- step 1 -------------------------------------------------------------
    for suf in _SV_STEP1:
        pos = len(w) - len(suf)
        if w.endswith(suf) and in_r1(pos):
            w = w[:pos]
            break
    else:
        if w.endswith("s") and in_r1(len(w) - 1) and len(w) >= 2 \
                and w[-2] in _SV_S_END:
            w = w[:-1]

    # ---- step 2 -------------------------------------------------------------
    if w.endswith(("dd", "gd", "nn", "dt", "gt", "kt", "tt")) \
            and in_r1(len(w) - 1):
        w = w[:-1]

    # ---- step 3 -------------------------------------------------------------
    for suf in ("lig", "ig", "els"):
        pos = len(w) - len(suf)
        if w.endswith(suf) and in_r1(pos):
            w = w[:pos]
            break
    else:
        if w.endswith("löst") and in_r1(len(w) - 1):
            w = w[:-1]
        elif w.endswith("fullt") and in_r1(len(w) - 1):
            w = w[:-1]
    return w
