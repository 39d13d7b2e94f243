"""Pure-Python Snowball English ("Porter2") stemmer.

The reference's recommended configuration stems with PyStemmer
(``reference/bm25s/tokenization.py:675-699``; tests
``reference/tests/core/test_tokenizer.py``).  PyStemmer is a C binding
that isn't installable everywhere (it's absent from this environment),
so we vendor the algorithm itself: this is an independent implementation
of the *published* Snowball English stemming algorithm
(https://snowballstem.org/algorithms/english/stemmer.html — public
specification; no code is derived from PyStemmer/Snowball sources).

The class exposes the same ``stemWords`` surface PyStemmer does, so it
slots into ``tokenization.load_stemmer`` and can equally be passed to
the reference library's ``tokenize(..., stemmer=...)`` for parity
testing.

Input is assumed lowercase (our tokenizer lowercases before stemming,
matching the reference pipeline order,
``reference/bm25s/tokenization.py:649-699``).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_VALID = frozenset("cdeghkmnrt")

# exceptional forms (spec: "exception1")
_EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariant forms
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
# words whose stemming stops after step 1a (spec: "exception2")
_EXCEPTION2 = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed")
)

_STEP2 = [
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
    ("izer", "ize"), ("ator", "ate"), ("alli", "al"), ("bli", "ble"),
]
_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
    ("ness", ""), ("ful", ""),
]
_STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "al", "er", "ic",
]


def _is_vowel(c: str) -> bool:
    return c in _VOWELS  # marked "Y" is a consonant by construction


def _regions(w: str) -> tuple[int, int]:
    """(r1, r2) start offsets.  R1 = after the first vowel→non-vowel
    pair (special prefixes gener/commun/arsen pin R1 past the prefix);
    R2 = the same rule applied inside R1."""
    n = len(w)
    r1 = n
    if w.startswith(("gener", "arsen")):
        r1 = 5
    elif w.startswith("commun"):
        r1 = 6
    else:
        for i in range(1, n):
            if not _is_vowel(w[i]) and _is_vowel(w[i - 1]):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(w[i]) and _is_vowel(w[i - 1]):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(w: str) -> bool:
    """vowel + non-vowel (≠ w, x, Y) preceded by a non-vowel; or, at the
    start of the word, vowel + non-vowel."""
    n = len(w)
    if n == 2:
        return _is_vowel(w[0]) and not _is_vowel(w[1])
    if n >= 3:
        return (
            not _is_vowel(w[-3])
            and _is_vowel(w[-2])
            and (not _is_vowel(w[-1]))
            and w[-1] not in "wxY"
        )
    return False


def _contains_vowel(w: str) -> bool:
    return any(_is_vowel(c) for c in w)


def stem(word: str) -> str:
    w = word
    if w.startswith("'"):
        w = w[1:]
    if len(w) <= 2:
        return w
    if w in _EXCEPTION1:
        return _EXCEPTION1[w]

    # mark consonant-y as "Y"
    if w[0] == "y":
        w = "Y" + w[1:]
    chars = list(w)
    for i in range(1, len(chars)):
        if chars[i] == "y" and _is_vowel(chars[i - 1]):
            chars[i] = "Y"
    w = "".join(chars)

    r1, r2 = _regions(w)

    # step 0: longest of 's' / 's / '
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-2] if len(w) > 4 else w[:-1]
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        if _contains_vowel(w[:-2]):
            w = w[:-1]

    if w in _EXCEPTION2:
        return w

    # step 1b
    fired = None
    for suf in ("eedly", "ingly", "edly", "eed", "ing", "ed"):
        if w.endswith(suf):
            fired = suf
            break
    if fired in ("eed", "eedly"):
        if len(w) - len(fired) >= r1:
            w = w[: -len(fired)] + "ee"
    elif fired is not None:
        stem_part = w[: -len(fired)]
        if _contains_vowel(stem_part):
            w = stem_part
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif w.endswith(_DOUBLES):
                w = w[:-1]
            elif _ends_short_syllable(w) and r1 >= len(w):
                w += "e"

    # step 1c: y/Y → i after a non-vowel that isn't the first letter
    if (
        len(w) > 2
        and w[-1] in "yY"
        and not _is_vowel(w[-2])
    ):
        w = w[:-1] + "i"

    # step 2 (in R1)
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + rep
            break
    else:
        if w.endswith("ogi"):
            if len(w) - 3 >= r1 and len(w) >= 4 and w[-4] == "l":
                w = w[:-1]
        elif w.endswith("li"):
            if len(w) - 2 >= r1 and len(w) >= 3 and w[-3] in _LI_VALID:
                w = w[:-2]

    # step 3 (in R1; "ative" needs R2)
    for suf, rep in _STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + rep
            break
    else:
        if w.endswith("ative") and len(w) - 5 >= r2:
            w = w[:-5]

    # step 4 (in R2)
    for suf in _STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                w = w[: -len(suf)]
            break
    else:
        if w.endswith("ion") and len(w) - 3 >= r2 and len(w) >= 4 and w[-4] in "st":
            w = w[:-3]

    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (
            len(w) - 1 >= r1 and not _ends_short_syllable(w[:-1])
        ):
            w = w[:-1]
    elif w.endswith("ll") and len(w) - 1 >= r2:
        w = w[:-1]

    return w.replace("Y", "y")


class SnowballEnglishStemmer:
    """PyStemmer-compatible surface (``stemWord`` / ``stemWords``)."""

    def stemWord(self, word: str) -> str:
        return stem(word)

    def stemWords(self, words) -> list[str]:
        return [stem(wrd) for wrd in words]


# ---------------------------------------------------------------------------
# Snowball German
# ---------------------------------------------------------------------------
# Independent implementation of the published Snowball German stemming
# algorithm (https://snowballstem.org/algorithms/german/stemmer.html) —
# the reference's most common non-English configuration
# (``reference/bm25s/tokenization.py:675-699`` routes every Snowball
# language through PyStemmer; German is vendored here so it works
# without the C binding).  Implements the Snowball 3.0 revision of the
# spec (-erin/-erinnen step-1 suffixes, "em not preceded by syst"
# guard); a pre-3.0 PyStemmer would diverge on exactly those forms.

_DE_VOWELS = frozenset("aeiouyäöü")
_DE_S_ENDINGS = frozenset("bdfghklmnrt")
_DE_ST_ENDINGS = frozenset("bdfghklmnt")


def _de_regions(w: str) -> tuple[int, int]:
    """Standard (R1, R2) starts; R1 is then adjusted so the region
    before it holds at least 3 letters (spec)."""
    n = len(w)
    r1 = n
    for i in range(1, n):
        if w[i] not in _DE_VOWELS and w[i - 1] in _DE_VOWELS:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in _DE_VOWELS and w[i - 1] in _DE_VOWELS:
            r2 = i + 1
            break
    return max(r1, 3), r2


def _de_longest(w: str, sufs) -> str | None:
    best = None
    for s in sufs:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


def stem_german(word: str) -> str:
    w = word.replace("ß", "ss")
    # mark u/y between vowels as consonants (upper case)
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if (
            chars[i] in "uy"
            and chars[i - 1] in _DE_VOWELS
            and chars[i + 1] in _DE_VOWELS
        ):
            chars[i] = chars[i].upper()
    w = "".join(chars)
    r1, r2 = _de_regions(w)

    def in_r1(suf_len: int) -> bool:
        return len(w) - suf_len >= r1

    def in_r2(suf_len: int) -> bool:
        return len(w) - suf_len >= r2

    # step 1 (Snowball 3.0 revision): longest of
    #   em(not preceded by "syst")/ern/er | e/en/es/erin/erinnen |
    #   s(valid s-ending)
    # — the longest match decides; a failed condition removes nothing.
    # The erin/erinnen suffixes and the syst guard are the 3.0 additions
    # (pre-3.0 stemmed "system"→"syst" and left "lehrerin" whole).
    suf = _de_longest(
        w, ("erinnen", "erin", "ern", "em", "er", "en", "es", "e", "s")
    )
    if suf in ("ern", "em", "er"):
        if in_r1(len(suf)) and not (suf == "em" and w[:-2].endswith("syst")):
            w = w[: -len(suf)]
    elif suf in ("erinnen", "erin", "en", "es", "e"):
        if in_r1(len(suf)):
            w = w[: -len(suf)]
            if w.endswith("niss"):
                w = w[:-1]
    elif suf == "s":
        if in_r1(1) and len(w) >= 2 and w[-2] in _DE_S_ENDINGS:
            w = w[:-1]

    # step 2: longest of en/er/est | st(valid st-ending, itself preceded
    # by ≥3 letters)
    suf = _de_longest(w, ("est", "en", "er", "st"))
    if suf in ("est", "en", "er"):
        if in_r1(len(suf)):
            w = w[: -len(suf)]
    elif suf == "st":
        if in_r1(2) and len(w) >= 6 and w[-3] in _DE_ST_ENDINGS:
            w = w[:-2]

    # step 3: d-suffixes
    suf = _de_longest(
        w, ("lich", "heit", "keit", "isch", "end", "ung", "ig", "ik")
    )
    if suf in ("end", "ung"):
        if in_r2(len(suf)):
            w = w[: -len(suf)]
            if (
                w.endswith("ig")
                and len(w) - 2 >= r2
                and (len(w) < 3 or w[-3] != "e")
            ):
                w = w[:-2]
    elif suf in ("ig", "ik", "isch"):
        if in_r2(len(suf)) and (len(w) - len(suf) == 0 or w[-len(suf) - 1] != "e"):
            w = w[: -len(suf)]
    elif suf in ("lich", "heit"):
        if in_r2(4):
            w = w[:-4]
            tail = _de_longest(w, ("er", "en"))
            if tail and len(w) - 2 >= r1:
                w = w[:-2]
    elif suf == "keit":
        if in_r2(4):
            w = w[:-4]
            if w.endswith("lich") and len(w) - 4 >= r2:
                w = w[:-4]
            elif w.endswith("ig") and len(w) - 2 >= r2:
                w = w[:-2]

    w = w.replace("U", "u").replace("Y", "y")
    return (
        w.replace("ä", "a").replace("ö", "o").replace("ü", "u")
    )


class SnowballGermanStemmer:
    """PyStemmer-compatible surface (``stemWord`` / ``stemWords``)."""

    def stemWord(self, word: str) -> str:
        return stem_german(word)

    def stemWords(self, words) -> list[str]:
        return [stem_german(wrd) for wrd in words]


# ---------------------------------------------------------------------------
# Snowball French
# ---------------------------------------------------------------------------
# Independent implementation of the published Snowball French stemming
# algorithm (https://snowballstem.org/algorithms/french/stemmer.html) —
# after German, the most likely non-English corpus configuration the
# reference routes through PyStemmer
# (``reference/bm25s/tokenization.py:675-699``).  Implements the classic
# published revision (the algorithm behind the widely-deployed 2.x
# PyStemmer/NLTK ports); the Snowball 3.0 ë/ï "He/Hi" prelude refinement
# is not applied (our tokenizer feeds plain lowercase \\w tokens).

_FR_VOWELS = frozenset("aeiouyâàëéêèïîôûù")

# step 1 suffix groups (longest match across ALL of them decides)
_FR_S1_DEL_R2 = (
    "ance", "iqUe", "isme", "able", "iste", "eux",
    "ances", "iqUes", "ismes", "ables", "istes",
)
_FR_S1_ATEUR = ("atrice", "ateur", "ation", "atrices", "ateurs", "ations")
_FR_S1_ALL = (
    _FR_S1_DEL_R2 + _FR_S1_ATEUR
    + ("logie", "logies", "usion", "ution", "usions", "utions",
       "ence", "ences", "ement", "ements", "ité", "ités",
       "if", "ive", "ifs", "ives", "eaux", "aux", "euse", "euses",
       "issement", "issements", "amment", "emment", "ment", "ments")
)
_FR_S2A = (
    "issaIent", "issantes", "iraIent", "issante", "issants", "issions",
    "irions", "issais", "issait", "issant", "issent", "issiez", "issons",
    "irais", "irait", "irent", "iriez", "irons", "iront", "isses",
    "issez", "îmes", "îtes", "irai", "iras", "irez", "isse",
    "ies", "ira", "ît", "ie", "ir", "is", "it", "i",
)
_FR_S2B_E = (
    "eraIent", "erions", "èrent", "erais", "erait", "eriez", "erons",
    "eront", "erai", "eras", "erez", "ées", "era", "iez", "ée", "és",
    "er", "ez", "é",
)
_FR_S2B_A = (
    "assions", "assent", "assiez", "aIent", "antes", "asses", "âmes",
    "âtes", "ante", "ants", "asse", "ais", "ait", "ant", "as", "ai",
    "ât", "a",
)


def _fr_isv(c: str) -> bool:
    return c in _FR_VOWELS


def _fr_prelude(w: str) -> str:
    """Mark u/i between vowels, y next to a vowel, and u after q as
    consonants (upper case), scanning left to right on the evolving
    string (a marked letter is a consonant for later decisions)."""
    chars = list(w)
    n = len(chars)
    for i in range(n):
        c = chars[i]
        if c == "u":
            if i > 0 and chars[i - 1] == "q":
                chars[i] = "U"
            elif 0 < i < n - 1 and _fr_isv(chars[i - 1]) and _fr_isv(chars[i + 1]):
                chars[i] = "U"
        elif c == "i":
            if 0 < i < n - 1 and _fr_isv(chars[i - 1]) and _fr_isv(chars[i + 1]):
                chars[i] = "I"
        elif c == "y":
            if (i > 0 and _fr_isv(chars[i - 1])) or (
                i < n - 1 and _fr_isv(chars[i + 1])
            ):
                chars[i] = "Y"
    return "".join(chars)


def _fr_rv(w: str) -> int:
    """RV start: after the third letter if the word begins with two
    vowels or with par/col/tap; else after the first vowel not at the
    start; else end of word."""
    n = len(w)
    if n >= 3 and (
        w[:3] in ("par", "col", "tap")
        or (_fr_isv(w[0]) and _fr_isv(w[1]))
    ):
        return 3
    for i in range(1, n):
        if _fr_isv(w[i]):
            return i + 1
    return n


def _fr_r1r2(w: str) -> tuple[int, int]:
    n = len(w)
    r1 = n
    for i in range(1, n):
        if not _fr_isv(w[i]) and _fr_isv(w[i - 1]):
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if not _fr_isv(w[i]) and _fr_isv(w[i - 1]):
            r2 = i + 1
            break
    return r1, r2


def _fr_longest(w: str, sufs, min_start: int | None = None) -> str | None:
    """Longest suffix of ``w`` among ``sufs``; with ``min_start``, only
    suffixes lying entirely at/after that offset qualify (the Snowball
    ``setlimit`` semantics of steps 2a/2b/4)."""
    best = None
    for s in sufs:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            if min_start is None or len(w) - len(s) >= min_start:
                best = s
    return best


def stem_french(word: str) -> str:
    w = _fr_prelude(word)
    rv = _fr_rv(w)
    r1, r2 = _fr_r1r2(w)

    def in_rv(wl, ln):
        return wl - ln >= rv

    def in_r1(wl, ln):
        return wl - ln >= r1

    def in_r2(wl, ln):
        return wl - ln >= r2

    # ---- step 1: standard suffix removal ----
    step1_changed = False
    ment_removed = False
    suf = _fr_longest(w, _FR_S1_ALL)
    if suf is not None:
        L = len(w)
        sl = len(suf)
        if suf in _FR_S1_DEL_R2:
            if in_r2(L, sl):
                w = w[:-sl]
                step1_changed = True
        elif suf in _FR_S1_ATEUR:
            if in_r2(L, sl):
                w = w[:-sl]
                step1_changed = True
                if w.endswith("ic"):
                    if in_r2(len(w), 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif suf in ("logie", "logies"):
            if in_r2(L, sl):
                w = w[:-sl] + "log"
                step1_changed = True
        elif suf in ("usion", "ution", "usions", "utions"):
            if in_r2(L, sl):
                w = w[:-sl] + "u"
                step1_changed = True
        elif suf in ("ence", "ences"):
            if in_r2(L, sl):
                w = w[:-sl] + "ent"
                step1_changed = True
        elif suf in ("ement", "ements"):
            if in_rv(L, sl):
                w = w[:-sl]
                step1_changed = True
                if w.endswith("iv") and in_r2(len(w), 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w), 2):
                        w = w[:-2]
                elif w.endswith("eus"):
                    if in_r2(len(w), 3):
                        w = w[:-3]
                    elif in_r1(len(w), 3):
                        w = w[:-3] + "eux"
                elif w.endswith("abl") and in_r2(len(w), 3):
                    w = w[:-3]
                elif w.endswith("iqU") and in_r2(len(w), 3):
                    w = w[:-3]
                elif w.endswith("ièr") and in_rv(len(w), 3):
                    w = w[:-3] + "i"
                elif w.endswith("Ièr") and in_rv(len(w), 3):
                    w = w[:-3] + "i"
        elif suf in ("ité", "ités"):
            if in_r2(L, sl):
                w = w[:-sl]
                step1_changed = True
                if w.endswith("abil"):
                    if in_r2(len(w), 4):
                        w = w[:-4]
                    else:
                        w = w[:-4] + "abl"
                elif w.endswith("ic"):
                    if in_r2(len(w), 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                elif w.endswith("iv") and in_r2(len(w), 2):
                    w = w[:-2]
        elif suf in ("if", "ive", "ifs", "ives"):
            if in_r2(L, sl):
                w = w[:-sl]
                step1_changed = True
                if w.endswith("at") and in_r2(len(w), 2):
                    w = w[:-2]
                    if w.endswith("ic"):
                        if in_r2(len(w), 2):
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
        elif suf == "eaux":
            w = w[:-4] + "eau"
            step1_changed = True
        elif suf == "aux":
            if in_r1(L, 3):
                w = w[:-3] + "al"
                step1_changed = True
        elif suf in ("euse", "euses"):
            if in_r2(L, sl):
                w = w[:-sl]
                step1_changed = True
            elif in_r1(L, sl):
                w = w[:-sl] + "eux"
                step1_changed = True
        elif suf in ("issement", "issements"):
            if in_r1(L, sl) and L > sl and not _fr_isv(w[L - sl - 1]):
                w = w[:-sl]
                step1_changed = True
        elif suf == "amment":
            if in_rv(L, 6):
                w = w[:-6] + "ant"
                step1_changed = True
                ment_removed = True
        elif suf == "emment":
            if in_rv(L, 6):
                w = w[:-6] + "ent"
                step1_changed = True
                ment_removed = True
        elif suf in ("ment", "ments"):
            pre = L - sl - 1
            if pre >= rv and _fr_isv(w[pre]):
                w = w[:-sl]
                step1_changed = True
                ment_removed = True

    # ---- step 2a: verb suffixes beginning i (in RV) ----
    do2a = (not step1_changed) or ment_removed
    step2a_changed = False
    did2b = False
    step2b_changed = False
    if do2a:
        suf = _fr_longest(w, _FR_S2A, min_start=rv)
        if suf is not None:
            pre = len(w) - len(suf) - 1
            if pre >= rv and not _fr_isv(w[pre]):
                w = w[: -len(suf)]
                step2a_changed = True
        # ---- step 2b: other verb suffixes (in RV) ----
        if not step2a_changed:
            did2b = True
            suf = _fr_longest(
                w, ("ions",) + _FR_S2B_E + _FR_S2B_A, min_start=rv
            )
            if suf == "ions":
                if in_r2(len(w), 4):
                    w = w[:-4]
                    step2b_changed = True
            elif suf in _FR_S2B_E:
                w = w[: -len(suf)]
                step2b_changed = True
            elif suf in _FR_S2B_A:
                w = w[: -len(suf)]
                step2b_changed = True
                if w.endswith("e") and len(w) - 1 >= rv:
                    w = w[:-1]

    # the last obeyed step decides: step 3 on alteration, step 4 otherwise
    last_altered = step2b_changed if did2b else True
    if last_altered:
        # ---- step 3 ----
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # ---- step 4: residual suffixes ----
        if w.endswith("s") and len(w) >= 2 and w[-2] not in "aiouès":
            w = w[:-1]
        suf = _fr_longest(
            w, ("ière", "Ière", "ion", "ier", "Ier", "e"), min_start=rv
        )
        if suf == "ion":
            pre = len(w) - 4
            if in_r2(len(w), 3) and pre >= rv and w[pre] in "st":
                w = w[:-3]
        elif suf in ("ier", "ière", "Ier", "Ière"):
            w = w[: -len(suf)] + "i"
        elif suf == "e":
            w = w[:-1]

    # ---- step 5: undouble ----
    if w.endswith(("enn", "onn", "ett", "ell", "eill")):
        w = w[:-1]

    # ---- step 6: un-accent ----
    k = len(w)
    while k > 0 and not _fr_isv(w[k - 1]):
        k -= 1
    if 0 < k < len(w) and w[k - 1] in "éè":
        w = w[: k - 1] + "e" + w[k:]

    return w.replace("I", "i").replace("U", "u").replace("Y", "y")


class SnowballFrenchStemmer:
    """PyStemmer-compatible surface (``stemWord`` / ``stemWords``)."""

    def stemWord(self, word: str) -> str:
        return stem_french(word)

    def stemWords(self, words) -> list[str]:
        return [stem_french(wrd) for wrd in words]


# ---------------------------------------------------------------------------
# Snowball Spanish
# ---------------------------------------------------------------------------
# Independent implementation of the published Snowball Spanish stemming
# algorithm (https://snowballstem.org/algorithms/spanish/stemmer.html),
# completing the reference's most common Snowball configurations
# (``reference/bm25s/tokenization.py:675-699``).

_ES_VOWELS = frozenset("aeiouáéíóúü")

_ES_PRONOUNS = (
    "selas", "selos", "sela", "selo", "las", "les", "los", "nos",
    "me", "se", "la", "le", "lo",
)
_ES_S1_DEL_R2 = (
    "anza", "anzas", "ico", "ica", "icos", "icas", "ismo", "ismos",
    "able", "ables", "ible", "ibles", "ista", "istas", "oso", "osa",
    "osos", "osas", "amiento", "amientos", "imiento", "imientos",
)
_ES_S1_ADOR = (
    "adora", "ador", "ación", "adoras", "adores", "aciones",
    "ante", "antes", "ancia", "ancias",
)
_ES_S1_ALL = (
    _ES_S1_DEL_R2 + _ES_S1_ADOR
    + ("logía", "logías", "ución", "uciones", "encia", "encias",
       "amente", "mente", "idad", "idades", "iva", "ivo", "ivas", "ivos")
)
_ES_S2A = (
    "yeron", "yendo", "yamos", "yais", "yan", "yen", "yas", "yes",
    "ya", "ye", "yo", "yó",
)
_ES_S2B_GU = ("en", "es", "éis", "emos")
_ES_S2B = _ES_S2B_GU + (
    "arían", "arías", "arán", "arás", "aríais", "aría", "aréis",
    "aríamos", "aremos", "ará", "aré",
    "erían", "erías", "erán", "erás", "eríais", "ería", "eréis",
    "eríamos", "eremos", "erá", "eré",
    "irían", "irías", "irán", "irás", "iríais", "iría", "iréis",
    "iríamos", "iremos", "irá", "iré",
    "aba", "ada", "ida", "ía", "ara", "iera", "ad", "ed", "id",
    "ase", "iese", "aste", "iste", "an", "aban", "ían", "aran",
    "ieran", "asen", "iesen", "aron", "ieron", "ado", "ido", "ando",
    "iendo", "ió", "ar", "er", "ir", "as", "abas", "adas", "idas",
    "ías", "aras", "ieras", "ases", "ieses", "ís", "áis", "abais",
    "íais", "arais", "ierais", "aseis", "ieseis", "asteis", "isteis",
    "ados", "idos", "amos", "ábamos", "íamos", "imos", "áramos",
    "iéramos", "iésemos", "ásemos",
)
_ES_UNACCENT = str.maketrans("áéíóú", "aeiou")


def _es_isv(c: str) -> bool:
    return c in _ES_VOWELS


def _es_rv(w: str) -> int:
    """RV start: second letter consonant → after the next vowel; first
    two letters vowels → after the next consonant; consonant-vowel →
    after the third letter; else end of word."""
    n = len(w)
    if n < 3:
        return n
    if not _es_isv(w[1]):
        for i in range(2, n):
            if _es_isv(w[i]):
                return i + 1
        return n
    if _es_isv(w[0]):
        for i in range(2, n):
            if not _es_isv(w[i]):
                return i + 1
        return n
    return 3


def _es_r1r2(w: str) -> tuple[int, int]:
    n = len(w)
    r1 = n
    for i in range(1, n):
        if not _es_isv(w[i]) and _es_isv(w[i - 1]):
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if not _es_isv(w[i]) and _es_isv(w[i - 1]):
            r2 = i + 1
            break
    return r1, r2


def stem_spanish(word: str) -> str:
    w = word
    rv = _es_rv(w)
    r1, r2 = _es_r1r2(w)

    def in_rv(wl, ln):
        return wl - ln >= rv

    def in_r1(wl, ln):
        return wl - ln >= r1

    def in_r2(wl, ln):
        return wl - ln >= r2

    # ---- step 0: attached pronoun (pronoun AND its verb ending in RV)
    suf = _fr_longest(w, _ES_PRONOUNS)
    if suf is not None and in_rv(len(w), len(suf)):
        base = w[:-len(suf)]
        for a, repl in (("iéndo", "iendo"), ("ándo", "ando"),
                        ("ár", "ar"), ("ér", "er"), ("ír", "ir")):
            if base.endswith(a) and in_rv(len(base), len(a)):
                w = base[:-len(a)] + repl
                break
        else:
            for b in ("iendo", "ando", "ar", "er", "ir"):
                if base.endswith(b) and in_rv(len(base), len(b)):
                    w = base
                    break
            else:
                if (
                    base.endswith("yendo")
                    and len(base) >= 6
                    and base[-6] == "u"
                    and in_rv(len(base), 5)
                ):
                    w = base

    # ---- step 1: standard suffix removal ----
    step1_removed = False
    suf = _fr_longest(w, _ES_S1_ALL)
    if suf is not None:
        L, sl = len(w), len(suf)
        if suf in _ES_S1_DEL_R2:
            if in_r2(L, sl):
                w = w[:-sl]
                step1_removed = True
        elif suf in _ES_S1_ADOR:
            if in_r2(L, sl):
                w = w[:-sl]
                step1_removed = True
                if w.endswith("ic") and in_r2(len(w), 2):
                    w = w[:-2]
        elif suf in ("logía", "logías"):
            if in_r2(L, sl):
                w = w[:-sl] + "log"
                step1_removed = True
        elif suf in ("ución", "uciones"):
            if in_r2(L, sl):
                w = w[:-sl] + "u"
                step1_removed = True
        elif suf in ("encia", "encias"):
            if in_r2(L, sl):
                w = w[:-sl] + "ente"
                step1_removed = True
        elif suf == "amente":
            if in_r1(L, 6):
                w = w[:-6]
                step1_removed = True
                if w.endswith("iv") and in_r2(len(w), 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w), 2):
                        w = w[:-2]
                elif w.endswith(("os", "ic", "ad")) and in_r2(len(w), 2):
                    w = w[:-2]
        elif suf == "mente":
            if in_r2(L, 5):
                w = w[:-5]
                step1_removed = True
                for p in ("ante", "able", "ible"):
                    if w.endswith(p) and in_r2(len(w), 4):
                        w = w[:-4]
                        break
        elif suf in ("idad", "idades"):
            if in_r2(L, sl):
                w = w[:-sl]
                step1_removed = True
                for p in ("abil", "ic", "iv"):
                    if w.endswith(p) and in_r2(len(w), len(p)):
                        w = w[:-len(p)]
                        break
        elif suf in ("iva", "ivo", "ivas", "ivos"):
            if in_r2(L, sl):
                w = w[:-sl]
                step1_removed = True
                if w.endswith("at") and in_r2(len(w), 2):
                    w = w[:-2]

    # ---- step 2a: verb suffixes beginning y (in RV, after u) ----
    step2a_removed = False
    if not step1_removed:
        suf = _fr_longest(w, _ES_S2A, min_start=rv)
        if suf is not None and len(w) > len(suf) and w[-len(suf) - 1] == "u":
            w = w[:-len(suf)]
            step2a_removed = True
        # ---- step 2b: other verb suffixes (in RV) ----
        if not step2a_removed:
            suf = _fr_longest(w, _ES_S2B, min_start=rv)
            if suf is not None:
                w = w[:-len(suf)]
                if suf in _ES_S2B_GU and w.endswith("gu") and len(w) - 1 >= rv:
                    w = w[:-1]

    # ---- step 3: residual suffix (always; in RV) ----
    suf = _fr_longest(w, ("os", "a", "o", "á", "í", "ó", "e", "é"),
                      min_start=rv)
    if suf is not None:
        w = w[:-len(suf)]
        if suf in ("e", "é") and w.endswith("gu") and len(w) - 1 >= rv:
            w = w[:-1]

    return w.translate(_ES_UNACCENT)


class SnowballSpanishStemmer:
    """PyStemmer-compatible surface (``stemWord`` / ``stemWords``)."""

    def stemWord(self, word: str) -> str:
        return stem_spanish(word)

    def stemWords(self, words) -> list[str]:
        return [stem_spanish(wrd) for wrd in words]


# ---------------------------------------------------------------------------
# Snowball Italian
# ---------------------------------------------------------------------------
# Independent implementation of the published Snowball Italian stemming
# algorithm (https://snowballstem.org/algorithms/italian/stemmer.html),
# further widening the reference's Snowball language matrix
# (``reference/bm25s/tokenization.py:675-699``).  Implements the classic
# published revision; the spec's unreachable legacy 'Yamo' verb entry is
# carried as 'Iamo' (the form the prelude's i-marking actually produces,
# e.g. "creiamo" → "creIamo").

_IT_VOWELS = frozenset("aeiouàèìòù")
_IT_ACUTE = str.maketrans("áéíóú", "àèìòù")

_IT_PRONOUNS = (
    "gliela", "gliele", "glieli", "glielo", "gliene",
    "sene", "mela", "mele", "meli", "melo", "mene",
    "tela", "tele", "teli", "telo", "tene",
    "cela", "cele", "celi", "celo", "cene",
    "vela", "vele", "veli", "velo", "vene",
    "gli", "ci", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
)
_IT_S1_DEL_R2 = (
    "anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi",
    "ismo", "ismi", "abile", "abili", "ibile", "ibili", "ista",
    "iste", "isti", "istà", "istè", "istì", "oso", "osi", "osa",
    "ose", "mente", "atrice", "atrici", "ante", "anti",
)
_IT_S1_AZIONE = ("azione", "azioni", "atore", "atori")
_IT_S1_ALL = (
    _IT_S1_DEL_R2 + _IT_S1_AZIONE
    + ("logia", "logie", "uzione", "uzioni", "usione", "usioni",
       "enza", "enze", "amento", "amenti", "imento", "imenti",
       "amente", "ità", "ivo", "ivi", "iva", "ive")
)
_IT_S2_VERB = (
    "ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
    "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano",
    "avate", "avi", "avo", "emmo", "enda", "ende", "endi", "endo",
    "erà", "erai", "eranno", "ere", "erebbe", "erebbero", "erei",
    "eremmo", "eremo", "ereste", "eresti", "erete", "erò", "erono",
    "essero", "ete", "eva", "evamo", "evano", "evate", "evi", "evo",
    "Iamo", "iamo", "immo", "irà", "irai", "iranno", "ire", "irebbe",
    "irebbero", "irei", "iremmo", "iremo", "ireste", "iresti",
    "irete", "irò", "irono", "isca", "iscano", "isce", "isci",
    "isco", "iscono", "issero", "ita", "ite", "iti", "ito", "iva",
    "ivamo", "ivano", "ivate", "ivi", "ivo", "ono", "uta", "ute",
    "uti", "uto", "ar", "ir",
)
_IT_UNMARK = str.maketrans("IU", "iu")


def _it_prelude(w: str) -> str:
    """Acute→grave accent normalization, then mark u-after-q and u/i
    between vowels as non-vowels (U/I), left to right — a mark removes
    the letter from the vowel set for the letters that follow it."""
    w = w.translate(_IT_ACUTE).replace("qu", "qU")
    out = list(w)
    for i in range(1, len(out) - 1):
        if (out[i] in "ui" and out[i - 1] in _IT_VOWELS
                and out[i + 1] in _IT_VOWELS):
            out[i] = "U" if out[i] == "u" else "I"
    return "".join(out)


def _it_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _IT_VOWELS:
        for i in range(2, n):
            if w[i] in _IT_VOWELS:
                return i + 1
        return n
    if w[0] in _IT_VOWELS:
        for i in range(2, n):
            if w[i] not in _IT_VOWELS:
                return i + 1
        return n
    return 3


def _it_r1r2(w: str) -> tuple[int, int]:
    n = len(w)
    r1 = n
    for i in range(1, n):
        if w[i] not in _IT_VOWELS and w[i - 1] in _IT_VOWELS:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in _IT_VOWELS and w[i - 1] in _IT_VOWELS:
            r2 = i + 1
            break
    return r1, r2


def stem_italian(word: str) -> str:
    w = _it_prelude(word)
    rv = _it_rv(w)
    r1, r2 = _it_r1r2(w)

    def in_rv(wl, ln):
        return wl - ln >= rv

    def in_r1(wl, ln):
        return wl - ln >= r1

    def in_r2(wl, ln):
        return wl - ln >= r2

    # ---- step 0: attached pronoun — the pronoun is deleted (after
    # ando/endo) or replaced by 'e' (after ar/er/ir); the verb ending
    # itself must lie in RV
    suf = _fr_longest(w, _IT_PRONOUNS)
    if suf is not None:
        base = w[: -len(suf)]
        if base.endswith(("ando", "endo")) and in_rv(len(base), 4):
            w = base
        elif base.endswith(("ar", "er", "ir")) and in_rv(len(base), 2):
            w = base + "e"

    # ---- step 1: standard suffixes (longest match, NO fallback — a
    # matched suffix whose region test fails blocks step 1 and hands the
    # original word to step 2, per Snowball's `standard_suffix or
    # verb_suffix`)
    step1_removed = False
    suf = _fr_longest(w, _IT_S1_ALL)
    if suf is not None:
        L, sl = len(w), len(suf)
        if suf in _IT_S1_DEL_R2:
            if in_r2(L, sl):
                w = w[:-sl]
                step1_removed = True
        elif suf in _IT_S1_AZIONE:
            if in_r2(L, sl):
                w = w[:-sl]
                step1_removed = True
                if w.endswith("ic") and in_r2(len(w), 2):
                    w = w[:-2]
        elif suf in ("logia", "logie"):
            if in_r2(L, sl):
                w = w[:-sl] + "log"
                step1_removed = True
        elif suf in ("uzione", "uzioni", "usione", "usioni"):
            if in_r2(L, sl):
                w = w[:-sl] + "u"
                step1_removed = True
        elif suf in ("enza", "enze"):
            if in_r2(L, sl):
                w = w[:-sl] + "ente"
                step1_removed = True
        elif suf in ("amento", "amenti", "imento", "imenti"):
            if in_rv(L, sl):
                w = w[:-sl]
                step1_removed = True
        elif suf == "amente":
            if in_r1(L, 6):
                w = w[:-6]
                step1_removed = True
                if w.endswith("iv") and in_r2(len(w), 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w), 2):
                        w = w[:-2]
                elif w.endswith("abil") and in_r2(len(w), 4):
                    w = w[:-4]
                elif w.endswith(("os", "ic")) and in_r2(len(w), 2):
                    w = w[:-2]
        elif suf == "ità":
            if in_r2(L, 3):
                w = w[:-3]
                step1_removed = True
                if w.endswith("abil") and in_r2(len(w), 4):
                    w = w[:-4]
                elif w.endswith(("ic", "iv")) and in_r2(len(w), 2):
                    w = w[:-2]
        elif suf in ("ivo", "ivi", "iva", "ive"):
            if in_r2(L, sl):
                w = w[:-sl]
                step1_removed = True
                if w.endswith("at") and in_r2(len(w), 2):
                    w = w[:-2]
                    if w.endswith("ic") and in_r2(len(w), 2):
                        w = w[:-2]

    # ---- step 2: verb suffixes (only if step 1 took no action; the
    # suffix must lie entirely in RV — Snowball setlimit semantics, so a
    # longer out-of-region match does not block a shorter in-region one)
    if not step1_removed:
        suf = _fr_longest(w, _IT_S2_VERB, min_start=rv)
        if suf is not None:
            w = w[: -len(suf)]

    # ---- step 3a: final vowel (and then a preceding i), in RV ----
    if w and w[-1] in "aeioàèìò" and in_rv(len(w), 1):
        w = w[:-1]
        if w.endswith("i") and in_rv(len(w), 1):
            w = w[:-1]

    # ---- step 3b: ch → c, gh → g, in RV ----
    if w.endswith(("ch", "gh")) and in_rv(len(w), 2):
        w = w[:-1]

    return w.translate(_IT_UNMARK)


class SnowballItalianStemmer:
    """PyStemmer-compatible surface (``stemWord`` / ``stemWords``)."""

    def stemWord(self, word: str) -> str:
        return stem_italian(word)

    def stemWords(self, words) -> list[str]:
        return [stem_italian(wrd) for wrd in words]


# ---------------------------------------------------------------------------
# Snowball Portuguese
# ---------------------------------------------------------------------------
# Independent implementation of the published Snowball Portuguese stemming
# algorithm (https://snowballstem.org/algorithms/portuguese/stemmer.html),
# the next-most-common language in the reference's Snowball matrix
# (``reference/bm25s/tokenization.py:675-699``).  Nasal vowels are carried
# through the algorithm in the spec's two-character form (ã → "a~",
# õ → "o~"; '~' is a consonant for region purposes) and restored by the
# postlude.

_PT_VOWELS = frozenset("aeiouáéíóúâêô")

# step 1 groups (post-prelude spellings)
_PT_S1_DEL_R2 = (
    "eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos",
    "ável", "ível", "ista", "istas", "oso", "osa", "osos", "osas",
    "amento", "amentos", "imento", "imentos", "adora", "ador",
    "aça~o", "adoras", "adores", "aço~es", "ante", "antes", "ância",
)
_PT_S1_ALL = _PT_S1_DEL_R2 + (
    "logia", "logias", "uça~o", "uço~es", "ência", "ências",
    "amente", "mente", "idade", "idades",
    "iva", "ivo", "ivas", "ivos", "ira", "iras",
)
_PT_S2_VERB = (
    "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá",
    "era", "irá", "ava", "asse", "esse", "isse", "aste", "este",
    "iste", "ei", "arei", "erei", "irei", "am", "iam", "ariam",
    "eriam", "iriam", "aram", "eram", "iram", "avam", "em", "arem",
    "erem", "irem", "assem", "essem", "issem", "ado", "ido", "ando",
    "endo", "indo", "ara~o", "era~o", "ira~o", "ar", "er", "ir",
    "as", "adas", "idas", "ias", "arias", "erias", "irias", "arás",
    "aras", "erás", "eras", "irás", "avas", "es", "ardes", "erdes",
    "irdes", "ares", "eres", "ires", "asses", "esses", "isses",
    "astes", "estes", "istes", "is", "ais", "eis", "íeis", "aríeis",
    "eríeis", "iríeis", "áreis", "areis", "éreis", "ereis", "íreis",
    "ireis", "ásseis", "ésseis", "ísseis", "áveis", "ados", "idos",
    "ámos", "amos", "íamos", "aríamos", "eríamos", "iríamos",
    "áramos", "éramos", "íramos", "ávamos", "emos", "aremos",
    "eremos", "iremos", "ássemos", "êssemos", "íssemos", "imos",
    "armos", "ermos", "irmos", "eu", "iu", "ou",
)
_PT_RESIDUAL = ("os", "a", "i", "o", "á", "í", "ó")


def _pt_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _PT_VOWELS:
        for i in range(2, n):
            if w[i] in _PT_VOWELS:
                return i + 1
        return n
    if w[0] in _PT_VOWELS:
        for i in range(2, n):
            if w[i] not in _PT_VOWELS:
                return i + 1
        return n
    return 3


def _pt_r1r2(w: str) -> tuple[int, int]:
    n = len(w)
    r1 = n
    for i in range(1, n):
        if w[i] not in _PT_VOWELS and w[i - 1] in _PT_VOWELS:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in _PT_VOWELS and w[i - 1] in _PT_VOWELS:
            r2 = i + 1
            break
    return r1, r2


def stem_portuguese(word: str) -> str:
    w = word.replace("ã", "a~").replace("õ", "o~")
    rv = _pt_rv(w)
    r1, r2 = _pt_r1r2(w)

    def in_rv(wl, ln):
        return wl - ln >= rv

    def in_r1(wl, ln):
        return wl - ln >= r1

    def in_r2(wl, ln):
        return wl - ln >= r2

    # ---- step 1: standard suffixes (longest match; a matched suffix
    # whose region test fails blocks step 1 entirely and hands the
    # ORIGINAL word to step 2 — Snowball `standard_suffix or verb_suffix`)
    removed = False
    suf = _fr_longest(w, _PT_S1_ALL)
    if suf is not None:
        L, sl = len(w), len(suf)
        if suf in _PT_S1_DEL_R2:
            if in_r2(L, sl):
                w = w[:-sl]
                removed = True
        elif suf in ("logia", "logias"):
            if in_r2(L, sl):
                w = w[:-sl] + "log"
                removed = True
        elif suf in ("uça~o", "uço~es"):
            if in_r2(L, sl):
                w = w[:-sl] + "u"
                removed = True
        elif suf in ("ência", "ências"):
            if in_r2(L, sl):
                w = w[:-sl] + "ente"
                removed = True
        elif suf == "amente":
            if in_r1(L, 6):
                w = w[:-6]
                removed = True
                if w.endswith("iv") and in_r2(len(w), 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w), 2):
                        w = w[:-2]
                elif w.endswith(("os", "ic", "ad")) and in_r2(len(w), 2):
                    w = w[:-2]
        elif suf == "mente":
            if in_r2(L, 5):
                w = w[:-5]
                removed = True
                for pre in ("ante", "avel", "ível"):
                    if w.endswith(pre) and in_r2(len(w), len(pre)):
                        w = w[:-len(pre)]
                        break
        elif suf in ("idade", "idades"):
            if in_r2(L, sl):
                w = w[:-sl]
                removed = True
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and in_r2(len(w), len(pre)):
                        w = w[:-len(pre)]
                        break
        elif suf in ("iva", "ivo", "ivas", "ivos"):
            if in_r2(L, sl):
                w = w[:-sl]
                removed = True
                if w.endswith("at") and in_r2(len(w), 2):
                    w = w[:-2]
        elif suf in ("ira", "iras"):
            if in_rv(L, sl) and w[: -sl].endswith("e"):
                w = w[:-sl] + "ir"
                removed = True

    # ---- step 2: verb suffixes (only if step 1 took no action; the
    # suffix must lie entirely in RV — setlimit semantics, so a longer
    # out-of-region match does not block a shorter in-region one)
    if not removed:
        suf = _fr_longest(w, _PT_S2_VERB, min_start=rv)
        if suf is not None:
            w = w[: -len(suf)]
            removed = True

    if removed:
        # ---- step 3: final i after c, in RV ----
        if w.endswith("ci") and in_rv(len(w), 1):
            w = w[:-1]
    else:
        # ---- step 4: residual suffix (longest), in RV ----
        suf = _fr_longest(w, _PT_RESIDUAL, min_start=rv)
        if suf is not None:
            w = w[: -len(suf)]

    # ---- step 5: residual form (always) ----
    if w and w[-1] in "eéê" and in_rv(len(w), 1):
        w = w[:-1]
        if w.endswith("gu") and in_rv(len(w), 1):
            w = w[:-1]
        elif w.endswith("ci") and in_rv(len(w), 1):
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")


class SnowballPortugueseStemmer:
    """PyStemmer-compatible surface (``stemWord`` / ``stemWords``)."""

    def stemWord(self, word: str) -> str:
        return stem_portuguese(word)

    def stemWords(self, words) -> list[str]:
        return [stem_portuguese(wrd) for wrd in words]
