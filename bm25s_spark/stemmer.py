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
