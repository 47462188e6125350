"""Snowball stemmers, continued: Romanian, Finnish, Hungarian, Turkish.

Implemented from the published Snowball algorithm descriptions
(snowballstem.org) — the same language set the reference exposes via
rust-stemmers (/root/reference/src/tokenizer/stemmer.rs:25-55).  Pure
Python, used through Arrow-batched pandas UDFs (analyzer.py), so a
worker stems a whole batch per call.

Each stemmer expects a lowercased word and returns the stem.  The
Turkish entry implements the published algorithm's suffix classes,
vowel-harmony checks, buffer-letter (y/n/s) validity rules, and final
consonant devoicing; its merged suffix-chain state machine is
approximated by one ordered pass outermost-class-first (documented on
the function), so a small number of multi-suffix words may differ from
the reference binary — the pinned vectors are hand-traced through the
published description.
"""

from __future__ import annotations

from tantivy_spark.functions.snowball import _r_after, _rv_std, _std_r1_r2

# --------------------------------------------------------------------------
# Romanian (snowball romanian algorithm)
# --------------------------------------------------------------------------

_RO_VOWELS = "aăâeiîou"

_RO_STEP0 = [
    # (suffix, replacement | None=delete | "__ile__" special), longest first
    ("iilor", "i"), ("ului", None), ("elor", "e"), ("iile", "i"),
    ("ilor", "i"), ("atei", "at"), ("aţie", "aţi"), ("aţia", "aţi"),
    ("aua", "a"), ("ele", "e"), ("iua", "i"), ("iei", "i"),
    ("ile", "__ile__"), ("ul", None), ("ea", "e"), ("ii", "i"),
]

_RO_STEP1 = [
    ("abilitate", "abil"), ("abilitati", "abil"), ("abilităi", "abil"),
    ("abilităţi", "abil"), ("ibilitate", "ibil"),
    ("ivitate", "iv"), ("ivitati", "iv"), ("ivităi", "iv"),
    ("ivităţi", "iv"),
    ("icitate", "ic"), ("icitati", "ic"), ("icităi", "ic"),
    ("icităţi", "ic"), ("icatori", "ic"), ("icator", "ic"),
    ("icivă", "ic"), ("iciva", "ic"), ("icive", "ic"), ("icivi", "ic"),
    ("iciv", "ic"),
    ("icală", "ic"), ("icala", "ic"), ("icale", "ic"), ("icali", "ic"),
    ("ical", "ic"),
    ("ativă", "at"), ("ativa", "at"), ("ative", "at"), ("ativi", "at"),
    ("ativ", "at"), ("aţiune", "at"), ("atoare", "at"), ("atori", "at"),
    ("ator", "at"), ("ătoare", "at"), ("ători", "at"), ("ător", "at"),
    ("itivă", "it"), ("itiva", "it"), ("itive", "it"), ("itivi", "it"),
    ("itiv", "it"), ("iţiune", "it"), ("itoare", "it"), ("itori", "it"),
    ("itor", "it"),
]

_RO_STEP2_DEL = (
    "at ata ată ati ate ut uta ută uti ute it ita ită iti ite ic ica ice "
    "ici ică abil abila abile abili abilă ibil ibila ibile ibili ibilă "
    "oasa oasă oase os osi oşi ant anta ante anti antă ator atori itate "
    "itati ităi ităţi iv iva ive ivi ivă").split()
_RO_STEP2_IST = "ism isme ist ista iste isti istă işti".split()

_RO_VERB_A = (
    "are ere ire âre ind ând indu ându eze ească ez ezi ează esc eşti "
    "eşte ăsc ăşti ăşte am ai au eam eai ea eaţi eau iam iai ia iaţi iau "
    "ui aşi arăm arăţi ară uşi urăm urăţi ură işi irăm irăţi iră âi âşi "
    "ârăm ârăţi âră asem aseşi ase aserăm aserăţi aseră isem iseşi ise "
    "iserăm iserăţi iseră âsem âseşi âse âserăm âserăţi âseră usem useşi "
    "use userăm userăţi useră").split()
_RO_VERB_B = (
    "ăm aţi em eţi im iţi âm âţi seşi serăm serăţi seră sei se sesem "
    "seseşi sese seserăm seserăţi seseră").split()


def _longest_suffix(w: str, sufs) -> str | None:
    best = None
    for s in sufs:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


def _longest_suffix_in(w: str, sufs, region: int) -> str | None:
    """Longest suffix of ``w`` lying entirely within the region starting
    at ``region`` — snowball's setlimit semantics: out-of-region suffixes
    do not participate in the among at all (unlike Romanian, where the
    region test is a post-condition on the longest match)."""
    best = None
    for s in sufs:
        if w.endswith(s) and len(w) - len(s) >= region \
                and (best is None or len(s) > len(best)):
            best = s
    return best


def romanian_stem(word: str) -> str:
    # accept both cedilla (ş ţ, the published algorithm's forms) and
    # comma-below (ș ț) spellings; work internally with cedilla
    w = word.replace("ș", "ş").replace("ț", "ţ")
    # prelude: i and u between vowels become consonants (I, U)
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "iu" and chars[i - 1] in _RO_VOWELS \
                and chars[i + 1] in _RO_VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)
    r1, r2 = _std_r1_r2(w, _RO_VOWELS)
    rv = _rv_std(w, _RO_VOWELS)

    def in_region(suf: str, region: int) -> bool:
        return len(w) - len(suf) >= region

    # step 0: removal of plurals
    s = _longest_suffix(w, [x for x, _ in _RO_STEP0])
    if s is not None and in_region(s, r1):
        repl = dict(_RO_STEP0)[s]
        if repl == "__ile__":
            if not w[: -len(s)].endswith("ab"):
                w = w[: -len(s)] + "i"
        elif repl is None:
            w = w[: -len(s)]
        else:
            w = w[: -len(s)] + repl

    # step 1: reduction of combining suffixes (repeat until no change)
    removed_12 = False
    while True:
        s = _longest_suffix(w, [x for x, _ in _RO_STEP1])
        if s is None or not in_region(s, r1):
            break
        w = w[: -len(s)] + dict(_RO_STEP1)[s]
        removed_12 = True

    # step 2: removal of standard suffixes (in R2)
    s = _longest_suffix(w, _RO_STEP2_DEL + _RO_STEP2_IST + ["iune", "iuni"])
    if s is not None and in_region(s, r2):
        if s in ("iune", "iuni"):
            if w[: -len(s)].endswith("ţ"):
                w = w[: -len(s) - 1] + "t"
                removed_12 = True
        elif s in _RO_STEP2_IST:
            w = w[: -len(s)] + "ist"
            removed_12 = True
        else:
            w = w[: -len(s)]
            removed_12 = True

    # step 3: verb suffixes — only if steps 1 and 2 removed nothing
    if not removed_12:
        s = _longest_suffix(w, _RO_VERB_A + _RO_VERB_B)
        if s is not None and in_region(s, rv):
            if s in _RO_VERB_B:
                w = w[: -len(s)]
            else:
                pre = len(w) - len(s) - 1
                if pre >= rv and (w[pre] not in _RO_VOWELS or w[pre] == "u"):
                    w = w[: -len(s)]

    # step 4: final vowel
    s = _longest_suffix(w, ["ie", "a", "e", "i", "ă"])
    if s is not None and in_region(s, rv):
        w = w[: -len(s)]

    return w.replace("I", "i").replace("U", "u")


# --------------------------------------------------------------------------
# Finnish (snowball finnish algorithm)
# --------------------------------------------------------------------------

_FI_VOWELS = "aeiouyäö"
_FI_RESTR = "aeiouäö"          # restricted vowel V (no y)
_FI_LV = tuple(v + v for v in _FI_RESTR)  # long vowels aa ee ii oo uu ää öö

_FI_STEP1A = "kin kaan kään ko kö han hän pa pä".split()
_FI_STEP3_PLAIN = ("tta ttä ta tä ssa ssä sta stä lla llä lta ltä lle "
                   "na nä ksi ine").split()
_FI_HXN = {"han": "a", "hen": "e", "hin": "i", "hon": "o", "hun": "u",
           "hyn": "y", "hän": "ä", "hön": "ö"}


def finnish_stem(word: str) -> str:
    w = word
    r1, r2 = _std_r1_r2(w, _FI_VOWELS)

    def in_r(suf: str, region: int, v: str) -> bool:
        return len(v) - len(suf) >= region

    # step 1: particle etc.
    s = _longest_suffix_in(w, _FI_STEP1A + ["sti"], r1)
    if s is not None:
        if s == "sti":
            if in_r(s, r2, w):
                w = w[: -len(s)]
        else:
            pre = w[: -len(s)]
            if pre and (pre[-1] in "nt" or pre[-1] in _FI_VOWELS):
                w = w[: -len(s)]

    # step 2: possessives
    s = _longest_suffix_in(w, ["si", "ni", "nsa", "nsä", "mme", "nne",
                               "an", "än", "en"], r1)
    if s is not None:
        pre = w[: -len(s)]
        if s == "si":
            if not pre.endswith("k"):
                w = pre
        elif s == "ni":
            w = pre[:-3] + "ksi" if pre.endswith("kse") else pre
        elif s in ("nsa", "nsä", "mme", "nne"):
            w = pre
        elif s == "an":
            if pre.endswith(("ta", "ssa", "sta", "lla", "lta", "na")):
                w = pre
        elif s == "än":
            if pre.endswith(("tä", "ssä", "stä", "llä", "ltä", "nä")):
                w = pre
        elif s == "en":
            if pre.endswith(("lle", "ine")):
                w = pre

    # step 3: cases
    ending_removed = False
    step3 = (list(_FI_HXN) + ["siin", "den", "tten", "seen"]
             + _FI_STEP3_PLAIN + ["a", "ä", "n"])
    s = _longest_suffix_in(w, step3, r1)
    if s is not None:
        pre = w[: -len(s)]
        if s in _FI_HXN:
            if pre.endswith(_FI_HXN[s]):
                w, ending_removed = pre, True
        elif s in ("siin", "den", "tten"):
            if len(pre) >= 2 and pre[-1] == "i" and pre[-2] in _FI_RESTR:
                w, ending_removed = pre, True
        elif s == "seen":
            if pre.endswith(_FI_LV):
                w, ending_removed = pre, True
        elif s in ("a", "ä"):
            if (len(pre) >= 2 and pre[-1] in _FI_VOWELS
                    and pre[-2] not in _FI_VOWELS):
                w, ending_removed = pre, True
        elif s in ("tta", "ttä"):
            if pre.endswith("e"):
                w, ending_removed = pre, True
        elif s in _FI_STEP3_PLAIN:
            w, ending_removed = pre, True
        elif s == "n":
            w, ending_removed = pre, True
            if w.endswith(_FI_LV) or w.endswith("ie"):
                w = w[:-1]

    # step 4: other endings (in R2)
    s = _longest_suffix_in(w, ["mpi", "mpa", "mpä", "mmi", "mma", "mmä",
                               "impi", "impa", "impä", "immi", "imma",
                               "immä", "eja", "ejä"], r2)
    if s is not None:
        if s.startswith("i") or s in ("eja", "ejä"):
            w = w[: -len(s)]
        elif not w[: -len(s)].endswith("po"):
            w = w[: -len(s)]

    # step 5: plurals
    if ending_removed:
        if w and w[-1] in "ij" and len(w) - 1 >= r1:
            w = w[:-1]
    else:
        if (w.endswith("t") and len(w) - 1 >= r1
                and len(w) >= 2 and w[-2] in _FI_VOWELS):
            w = w[:-1]
            s = _longest_suffix_in(w, ["imma", "mma"], r2)
            if s is not None:
                if s == "imma" or not w[: -len(s)].endswith("po"):
                    w = w[: -len(s)]

    # step 6: tidying up (each sub-step restricted to R1)
    if len(w) - 2 >= r1 and w.endswith(_FI_LV):
        w = w[:-1]
    if (len(w) - 2 >= r1 and len(w) >= 2 and w[-1] in "aäei"
            and w[-2] not in _FI_VOWELS):
        w = w[:-1]
    if len(w) - 2 >= r1 and w.endswith(("oj", "uj")):
        w = w[:-1]
    if len(w) - 2 >= r1 and w.endswith("jo"):
        w = w[:-1]
    # (e) final double consonant followed by zero or more vowels
    i = len(w) - 1
    while i >= 0 and w[i] in _FI_VOWELS:
        i -= 1
    if i >= 1 and w[i] not in _FI_VOWELS and w[i] == w[i - 1]:
        w = w[:i] + w[i + 1:]
    return w


# --------------------------------------------------------------------------
# Hungarian (snowball hungarian algorithm)
# --------------------------------------------------------------------------

_HU_VOWELS = "aáeéiíoóöőuúüű"
_HU_DIGRAPHS = ("dzs", "dz", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_DOUBLES = ("bb cc ccs dd ff gg ggy jj kk ll lly mm nn nny pp rr ss "
               "ssz tt tty vv zz zzs").split()

_HU_STEP2 = ("ban ben ba be ra re nak nek val vel tól től ról ről ból "
             "ből hoz hez höz nál nél ig at et ot öt ért képp képpen "
             "kor ul ül vá vé onként enként anként ként en on an ön "
             "n t").split()


def _hu_r1(w: str) -> int:
    if not w:
        return 0
    if w[0] in _HU_VOWELS:
        # after the first consonant or digraph
        for i in range(1, len(w)):
            if w[i] not in _HU_VOWELS:
                for d in _HU_DIGRAPHS:
                    if w.startswith(d, i):
                        return i + len(d)
                return i + 1
        return len(w)
    for i in range(1, len(w)):
        if w[i] in _HU_VOWELS:
            return i + 1
    return len(w)


def _hu_undouble(w: str) -> str:
    for d in sorted(_HU_DOUBLES, key=len, reverse=True):
        if w.endswith(d):
            # remove one letter of the doubled (di)graph: ssz->sz, ll->l
            half = len(d) // 2 if len(d) % 2 == 0 else (len(d) - 1) // 2
            return w[: len(w) - len(d)] + d[half:]
    return w


def _hu_v_end(w: str) -> str:
    """Post-deletion accent normalization: final á -> a, é -> e."""
    if w.endswith("á"):
        return w[:-1] + "a"
    if w.endswith("é"):
        return w[:-1] + "e"
    return w


def hungarian_stem(word: str) -> str:
    w = word
    r1 = _hu_r1(w)

    def in_r1(suf: str, v: str) -> bool:
        return len(v) - len(suf) >= r1

    def apply(table: list[tuple[str, str | None]], v: str,
              normalize: bool = False) -> str:
        s = _longest_suffix_in(v, [x for x, _ in table], r1)
        if s is None:
            return v
        repl = dict(table)[s]
        v = v[: -len(s)] + (repl or "")
        return _hu_v_end(v) if normalize else v

    # step 1: instrumental case (al/el after a double consonant)
    s = _longest_suffix_in(w, ["al", "el"], r1)
    if s is not None:
        pre = w[: -len(s)]
        if any(pre.endswith(d) for d in _HU_DOUBLES):
            w = _hu_undouble(pre)

    # step 2: frequent cases, then final á->a / é->e
    s = _longest_suffix_in(w, _HU_STEP2, r1)
    if s is not None:
        w = _hu_v_end(w[: -len(s)])

    # step 3: special cases
    w = apply([("ánként", "a"), ("án", "a"), ("én", "e")], w)
    # step 4: other cases
    w = apply([("astul", None), ("estül", None), ("ástul", "a"),
               ("éstül", "e"), ("stul", None), ("stül", None)], w)
    # step 5: factive case (á/é after a double consonant)
    s = _longest_suffix_in(w, ["á", "é"], r1)
    if s is not None:
        pre = w[: -len(s)]
        if any(pre.endswith(d) for d in _HU_DOUBLES):
            w = _hu_undouble(pre)
    # step 6: owned
    w = apply([("áké", "a"), ("áéi", "a"), ("éké", "e"), ("ééi", "e"),
               ("oké", None), ("öké", None), ("aké", None), ("eké", None),
               ("ké", None), ("éi", None), ("é", None)], w)
    # step 7: singular owner suffixes
    w = apply([("ánk", "a"), ("ájuk", "a"), ("ám", "a"), ("ád", "a"),
               ("á", "a"), ("énk", "e"), ("éjük", "e"), ("ém", "e"),
               ("éd", "e"), ("é", "e"), ("ünk", None), ("unk", None),
               ("nk", None), ("juk", None), ("jük", None), ("uk", None),
               ("ük", None), ("em", None), ("om", None), ("am", None),
               ("m", None), ("od", None), ("ed", None), ("ad", None),
               ("öd", None), ("d", None), ("ja", None), ("je", None),
               ("a", None), ("e", None), ("o", None)], w)
    # step 8: plural owner suffixes
    w = apply([("áim", "a"), ("áid", "a"), ("ái", "a"), ("áink", "a"),
               ("áitok", "a"), ("áik", "a"), ("éim", "e"), ("éid", "e"),
               ("éi", "e"), ("éink", "e"), ("éitek", "e"), ("éik", "e"),
               ("jaim", None), ("jeim", None), ("aim", None),
               ("eim", None), ("im", None), ("jaid", None),
               ("jeid", None), ("aid", None), ("eid", None), ("id", None),
               ("jai", None), ("jei", None), ("ai", None), ("ei", None),
               ("i", None), ("jaink", None), ("jeink", None),
               ("aink", None), ("eink", None), ("ink", None),
               ("jaitok", None), ("jeitek", None), ("aitok", None),
               ("eitek", None), ("itek", None), ("jeik", None),
               ("jaik", None), ("aik", None), ("eik", None),
               ("ik", None)], w)
    # step 9: plural suffixes
    w = apply([("ák", "a"), ("ék", "e"), ("ök", None), ("ok", None),
               ("ek", None), ("ak", None), ("k", None)], w)
    return w


# --------------------------------------------------------------------------
# Turkish (snowball turkish algorithm)
# --------------------------------------------------------------------------

_TR_VOWELS = "aeıiöüou"
_TR_FRONT = "eiöü"
_TR_BACK = "aıou"


def _tr_harmony(stem: str, suffix: str) -> bool:
    """Vowel harmony: the first suffix vowel must agree with the last
    stem vowel (published algorithm's check_vowel_harmony)."""
    lsv = next((c for c in reversed(stem) if c in _TR_VOWELS), None)
    fsv = next((c for c in suffix if c in _TR_VOWELS), None)
    if lsv is None or fsv is None:
        return True
    if fsv == "a":
        return lsv in _TR_BACK
    if fsv == "e":
        return lsv in _TR_FRONT
    if fsv == "ı":
        return lsv in "aı"
    if fsv == "i":
        return lsv in "ei"
    if fsv == "u":
        return lsv in "ou"
    if fsv == "ü":
        return lsv in "öü"
    return True


def _tr_forms(pattern: str) -> list[str]:
    """Expand A (a/e) and U (ı/i/u/ü) suffix variables; leading (y)/(n)/
    (s) marks an optional buffer consonant."""
    out = [""]
    for ch in pattern:
        if ch == "A":
            out = [o + v for o in out for v in "ae"]
        elif ch == "U":
            out = [o + v for o in out for v in "ıiuü"]
        elif ch == "D":
            out = [o + v for o in out for v in "dt"]
        elif ch == "C":
            out = [o + v for o in out for v in "cç"]
        else:
            out = [o + ch for o in out]
    return out


def _tr_strip(w: str, pattern: str, buffer: str = "") -> str | None:
    """Try to remove one suffix of the class ``pattern`` (with optional
    ``buffer`` consonant) from ``w``; None if no valid removal.  Buffer
    validity: the buffer consonant attaches only after a vowel; a bare
    vowel-initial suffix only after a consonant."""
    for suf in sorted(_tr_forms(pattern), key=len, reverse=True):
        cands = [(b, b + suf) for b in buffer] + [("", suf)]
        for b, c in cands:
            if not w.endswith(c) or len(w) - len(c) < 2:
                continue
            stem = w[: -len(c)]
            if not any(ch in _TR_VOWELS for ch in stem):
                continue
            # -ki and -ken are invariant (mark_ki / mark_ken have no
            # harmony check in the published algorithm)
            if pattern not in ("ki", "ken") and not _tr_harmony(stem, suf):
                continue
            if b:  # buffer consonant present: attaches only after a vowel
                if not (stem and stem[-1] in _TR_VOWELS):
                    continue
            elif buffer and suf[0] in _TR_VOWELS:
                # vowel-initial suffix without its buffer: only after a
                # consonant (otherwise the buffer form would have been used)
                if stem and stem[-1] in _TR_VOWELS:
                    continue
            return stem
    return None


#: nominal verb suffix classes, outermost first (published algorithm's
#: stem_nominal_verb_suffixes); each is (pattern, optional buffer)
_TR_NOMINAL_VERB = [
    ("casUna", ""), ("sUnUz", ""), ("DUr", ""), ("ken", "y"),
    ("mUş", "y"), ("sUn", ""), ("DU", "y"), ("sA", "y"),
    ("Um", "y"), ("Uz", "y"),
]

#: noun suffix classes, outermost first: the invariant relational -ki
#: (which chains onto a case ending beneath it), then case endings, then
#: possessives, then number (stem_noun_suffixes); tuples are
#: (pattern, buffer, stop_after).  "ki" skips the harmony check — it is
#: invariant in the published algorithm (mark_ki).
_TR_NOUN = [
    ("ki", "", False),
    ("lArUndA", "", False), ("lArU", "", True), ("ndA", "", False),
    ("nDAn", "", False), ("DAn", "", False), ("DA", "", False),
    ("nUn", "", False), ("Un", "", False),
    ("lA", "y", False), ("nA", "", False), ("A", "y", False),
    ("nU", "", False), ("UmUz", "", False), ("UnUz", "", False),
    ("Um", "", False), ("Un", "", False), ("U", "ys", False),
    ("lAr", "", False),
]


def turkish_stem(word: str) -> str:
    """Published Turkish Snowball algorithm: suffix classes with vowel
    harmony + buffer-consonant validity, then last-consonant devoicing
    (b->p, c->ç, d->t, ğ->k).  The reference's merged suffix-chain state
    machine is approximated by one ordered outermost-first pass per
    family (nominal-verb, then noun); vectors hand-traced."""
    w = word
    if len(w) <= 2:
        return w
    # nominal verb suffixes: first matching class only
    for pattern, buf in _TR_NOMINAL_VERB:
        out = _tr_strip(w, pattern, buf)
        if out is not None:
            w = out
            break
    # noun suffixes: ordered pass, each class at most once
    for pattern, buf, stop in _TR_NOUN:
        out = _tr_strip(w, pattern, buf)
        if out is not None:
            w = out
            if stop:
                break
    # post-process: final consonant devoicing
    if w and w[-1] in "bcdğ":
        w = w[:-1] + {"b": "p", "c": "ç", "d": "t", "ğ": "k"}[w[-1]]
    return w
