"""Best-effort grapheme→IPA conversion for Common Voice text.

The reference shells out to an espeak/phonemizer-class tool for this
(SURVEY.md §2 Common Voice row, [M]); no such tool exists in this
environment, so we bundle rule-based longest-match rewrite tables for
languages with (near-)phonemic orthographies plus a small English
lexicon + letter fallback. The interface is pluggable: pass a custom
``rules`` list or a ``lexicon`` dict to override.

Output phones use the same IPA inventory as ``data.ipa`` so binf
features derive automatically.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Dict, List, Optional, Sequence, Tuple

# Each rule: (grapheme string, ipa phones tuple). Applied longest-first at
# each position. Context-sensitive rules use a regex as the first element
# (matched at the current position) — kept rare for speed.

_ES_RULES = [
    ("ch", ("tʃ",)), ("ll", ("ʎ",)), ("rr", ("r",)), ("qu", ("k",)),
    ("gue", ("ɡ", "e")), ("gui", ("ɡ", "i")), ("güe", ("ɡ", "w", "e")),
    ("güi", ("ɡ", "w", "i")),
    ("ge", ("x", "e")), ("gi", ("x", "i")),
    ("ce", ("θ", "e")), ("ci", ("θ", "i")),
    ("ñ", ("ɲ",)), ("j", ("x",)), ("z", ("θ",)), ("v", ("b",)),
    ("h", ()), ("x", ("k", "s")), ("y", ("ʝ",)), ("w", ("w",)),
    ("á", ("a",)), ("é", ("e",)), ("í", ("i",)), ("ó", ("o",)), ("ú", ("u",)),
    ("ü", ("w",)),
    ("a", ("a",)), ("e", ("e",)), ("i", ("i",)), ("o", ("o",)), ("u", ("u",)),
    ("b", ("b",)), ("c", ("k",)), ("d", ("d",)), ("f", ("f",)), ("g", ("ɡ",)),
    ("k", ("k",)), ("l", ("l",)), ("m", ("m",)), ("n", ("n",)), ("p", ("p",)),
    ("q", ("k",)), ("r", ("ɾ",)), ("s", ("s",)), ("t", ("t",)),
]

_IT_RULES = [
    ("sch", ("s", "k")), ("sci", ("ʃ", "i")), ("sce", ("ʃ", "e")),
    ("gli", ("ʎ", "i")), ("gn", ("ɲ",)),
    ("chi", ("k", "i")), ("che", ("k", "e")),
    ("ghi", ("ɡ", "i")), ("ghe", ("ɡ", "e")),
    ("ci", ("tʃ", "i")), ("ce", ("tʃ", "e")),
    ("gi", ("dʒ", "i")), ("ge", ("dʒ", "e")),
    ("zz", ("ts",)), ("z", ("dz",)), ("h", ()),
    ("à", ("a",)), ("è", ("ɛ",)), ("é", ("e",)), ("ì", ("i",)),
    ("ò", ("ɔ",)), ("ó", ("o",)), ("ù", ("u",)),
    ("a", ("a",)), ("e", ("e",)), ("i", ("i",)), ("o", ("o",)), ("u", ("u",)),
    ("b", ("b",)), ("c", ("k",)), ("d", ("d",)), ("f", ("f",)), ("g", ("ɡ",)),
    ("l", ("l",)), ("m", ("m",)), ("n", ("n",)), ("p", ("p",)), ("q", ("k",)),
    ("r", ("r",)), ("s", ("s",)), ("t", ("t",)), ("v", ("v",)), ("w", ("w",)),
    ("x", ("k", "s")), ("y", ("j",)), ("k", ("k",)), ("j", ("j",)),
]

_DE_RULES = [
    ("sch", ("ʃ",)), ("tsch", ("tʃ",)), ("chs", ("k", "s")),
    ("ch", ("ç",)), ("ck", ("k",)), ("ph", ("f",)), ("th", ("t",)),
    ("qu", ("k", "v")), ("sp", ("ʃ", "p")), ("st", ("ʃ", "t")),
    ("ei", ("aɪ",)), ("ai", ("aɪ",)), ("au", ("aʊ",)), ("eu", ("ɔʏ",)),
    ("äu", ("ɔʏ",)), ("ie", ("iː",)),
    ("ä", ("ɛ",)), ("ö", ("ø",)), ("ü", ("y",)), ("ß", ("s",)),
    ("a", ("a",)), ("e", ("ə",)), ("i", ("ɪ",)), ("o", ("ɔ",)), ("u", ("ʊ",)),
    ("b", ("b",)), ("c", ("k",)), ("d", ("d",)), ("f", ("f",)), ("g", ("ɡ",)),
    ("h", ("h",)), ("j", ("j",)), ("k", ("k",)), ("l", ("l",)), ("m", ("m",)),
    ("n", ("n",)), ("p", ("p",)), ("r", ("ʁ",)), ("s", ("z",)), ("t", ("t",)),
    ("v", ("f",)), ("w", ("v",)), ("x", ("k", "s")), ("y", ("y",)), ("z", ("ts",)),
]

# tiny English lexicon for frequent words; everything else letter-fallback
_EN_LEXICON: Dict[str, Tuple[str, ...]] = {
    "the": ("ð", "ə"), "a": ("ə",), "an": ("æ", "n"), "and": ("æ", "n", "d"),
    "of": ("ʌ", "v"), "to": ("t", "u"), "in": ("ɪ", "n"), "is": ("ɪ", "z"),
    "you": ("j", "u"), "that": ("ð", "æ", "t"), "it": ("ɪ", "t"),
    "he": ("h", "i"), "she": ("ʃ", "i"), "was": ("w", "ʌ", "z"),
    "for": ("f", "ɔ", "ɹ"), "are": ("ɑ", "ɹ"), "with": ("w", "ɪ", "θ"),
    "his": ("h", "ɪ", "z"), "they": ("ð", "eɪ"), "this": ("ð", "ɪ", "s"),
    "have": ("h", "æ", "v"), "from": ("f", "ɹ", "ʌ", "m"),
    "one": ("w", "ʌ", "n"), "had": ("h", "æ", "d"), "not": ("n", "ɑ", "t"),
    "but": ("b", "ʌ", "t"), "what": ("w", "ʌ", "t"), "all": ("ɔ", "l"),
    "were": ("w", "ɝ"), "we": ("w", "i"), "when": ("w", "ɛ", "n"),
    "your": ("j", "ɔ", "ɹ"), "can": ("k", "æ", "n"), "said": ("s", "ɛ", "d"),
    "there": ("ð", "ɛ", "ɹ"), "each": ("i", "tʃ"), "which": ("w", "ɪ", "tʃ"),
    "do": ("d", "u"), "how": ("h", "aʊ"), "their": ("ð", "ɛ", "ɹ"),
    "if": ("ɪ", "f"), "will": ("w", "ɪ", "l"), "up": ("ʌ", "p"),
    "other": ("ʌ", "ð", "ɚ"), "about": ("ə", "b", "aʊ", "t"),
    "out": ("aʊ", "t"), "many": ("m", "ɛ", "n", "i"), "then": ("ð", "ɛ", "n"),
    "them": ("ð", "ɛ", "m"), "these": ("ð", "i", "z"), "so": ("s", "oʊ"),
    "some": ("s", "ʌ", "m"), "her": ("h", "ɝ"), "would": ("w", "ʊ", "d"),
    "make": ("m", "eɪ", "k"), "like": ("l", "aɪ", "k"), "him": ("h", "ɪ", "m"),
    "into": ("ɪ", "n", "t", "u"), "time": ("t", "aɪ", "m"),
    "has": ("h", "æ", "z"), "look": ("l", "ʊ", "k"), "two": ("t", "u"),
    "more": ("m", "ɔ", "ɹ"), "go": ("ɡ", "oʊ"), "see": ("s", "i"),
    "no": ("n", "oʊ"), "way": ("w", "eɪ"), "could": ("k", "ʊ", "d"),
    "my": ("m", "aɪ"), "than": ("ð", "æ", "n"), "been": ("b", "ɪ", "n"),
    "who": ("h", "u"), "its": ("ɪ", "t", "s"), "now": ("n", "aʊ"),
    "did": ("d", "ɪ", "d"), "get": ("ɡ", "ɛ", "t"), "come": ("k", "ʌ", "m"),
    "made": ("m", "eɪ", "d"), "may": ("m", "eɪ"), "part": ("p", "ɑ", "ɹ", "t"),
}

_EN_RULES = [
    ("tch", ("tʃ",)), ("ch", ("tʃ",)), ("sh", ("ʃ",)), ("th", ("θ",)),
    ("ph", ("f",)), ("wh", ("w",)), ("ck", ("k",)), ("ng", ("ŋ",)),
    ("qu", ("k", "w")), ("oo", ("u",)), ("ee", ("i",)), ("ea", ("i",)),
    ("ou", ("aʊ",)), ("ow", ("oʊ",)), ("ay", ("eɪ",)), ("ai", ("eɪ",)),
    ("oi", ("ɔɪ",)), ("oy", ("ɔɪ",)), ("igh", ("aɪ",)),
    ("a", ("æ",)), ("e", ("ɛ",)), ("i", ("ɪ",)), ("o", ("ɑ",)), ("u", ("ʌ",)),
    ("b", ("b",)), ("c", ("k",)), ("d", ("d",)), ("f", ("f",)), ("g", ("ɡ",)),
    ("h", ("h",)), ("j", ("dʒ",)), ("k", ("k",)), ("l", ("l",)), ("m", ("m",)),
    ("n", ("n",)), ("p", ("p",)), ("r", ("ɹ",)), ("s", ("s",)), ("t", ("t",)),
    ("v", ("v",)), ("w", ("w",)), ("x", ("k", "s")), ("y", ("j",)), ("z", ("z",)),
]

_FR_RULES = [
    ("eau", ("o",)), ("eaux", ("o",)), ("au", ("o",)), ("aux", ("o",)),
    ("oi", ("w", "a")), ("ou", ("u",)), ("eu", ("ø",)), ("œu", ("œ",)),
    ("ai", ("ɛ",)), ("ei", ("ɛ",)), ("é", ("e",)), ("è", ("ɛ",)),
    ("ê", ("ɛ",)), ("ë", ("ɛ",)), ("à", ("a",)), ("â", ("a",)),
    ("î", ("i",)), ("ï", ("i",)), ("ô", ("o",)), ("û", ("y",)),
    ("ù", ("y",)), ("ü", ("y",)), ("ç", ("s",)),
    ("ch", ("ʃ",)), ("gn", ("ɲ",)), ("qu", ("k",)), ("ph", ("f",)),
    ("on", ("ɔ̃",)), ("an", ("ɑ̃",)), ("en", ("ɑ̃",)), ("in", ("ɛ̃",)),
    ("un", ("œ̃",)), ("ille", ("i", "j")),
    ("j", ("ʒ",)), ("ge", ("ʒ", "ə")), ("gi", ("ʒ", "i")),
    ("ce", ("s", "ə")), ("ci", ("s", "i")), ("h", ()),
    ("a", ("a",)), ("e", ("ə",)), ("i", ("i",)), ("o", ("ɔ",)), ("u", ("y",)),
    ("y", ("i",)), ("b", ("b",)), ("c", ("k",)), ("d", ("d",)), ("f", ("f",)),
    ("g", ("ɡ",)), ("k", ("k",)), ("l", ("l",)), ("m", ("m",)), ("n", ("n",)),
    ("p", ("p",)), ("q", ("k",)), ("r", ("ʁ",)), ("s", ("s",)), ("t", ("t",)),
    ("v", ("v",)), ("w", ("w",)), ("x", ("k", "s")), ("z", ("z",)),
]

_PT_RULES = [
    ("lh", ("ʎ",)), ("nh", ("ɲ",)), ("ch", ("ʃ",)), ("ss", ("s",)),
    ("rr", ("ʁ",)), ("qu", ("k",)), ("gu", ("ɡ",)),
    ("ão", ("ɐ̃", "w̃")), ("õe", ("õ", "j")), ("ã", ("ɐ̃",)), ("õ", ("õ",)),
    ("á", ("a",)), ("à", ("a",)), ("â", ("ɐ",)), ("é", ("ɛ",)), ("ê", ("e",)),
    ("í", ("i",)), ("ó", ("ɔ",)), ("ô", ("o",)), ("ú", ("u",)), ("ç", ("s",)),
    ("ge", ("ʒ", "e")), ("gi", ("ʒ", "i")), ("ce", ("s", "e")), ("ci", ("s", "i")),
    ("h", ()), ("j", ("ʒ",)), ("x", ("ʃ",)),
    ("a", ("a",)), ("e", ("e",)), ("i", ("i",)), ("o", ("o",)), ("u", ("u",)),
    ("b", ("b",)), ("c", ("k",)), ("d", ("d",)), ("f", ("f",)), ("g", ("ɡ",)),
    ("k", ("k",)), ("l", ("l",)), ("m", ("m",)), ("n", ("n",)), ("p", ("p",)),
    ("q", ("k",)), ("r", ("ɾ",)), ("s", ("s",)), ("t", ("t",)), ("v", ("v",)),
    ("w", ("w",)), ("y", ("j",)), ("z", ("z",)),
]

_NL_RULES = [
    ("sch", ("s", "x")), ("ch", ("x",)), ("ng", ("ŋ",)), ("nk", ("ŋ", "k")),
    ("ij", ("ɛi",)), ("ei", ("ɛi",)), ("ui", ("œy",)), ("ou", ("ɑu",)),
    ("au", ("ɑu",)), ("oe", ("u",)), ("eu", ("ø",)), ("ie", ("i",)),
    ("aa", ("aː",)), ("ee", ("eː",)), ("oo", ("oː",)), ("uu", ("y",)),
    ("a", ("ɑ",)), ("e", ("ɛ",)), ("i", ("ɪ",)), ("o", ("ɔ",)), ("u", ("ʏ",)),
    ("b", ("b",)), ("c", ("k",)), ("d", ("d",)), ("f", ("f",)), ("g", ("ɣ",)),
    ("h", ("h",)), ("j", ("j",)), ("k", ("k",)), ("l", ("l",)), ("m", ("m",)),
    ("n", ("n",)), ("p", ("p",)), ("q", ("k",)), ("r", ("r",)), ("s", ("s",)),
    ("t", ("t",)), ("v", ("v",)), ("w", ("ʋ",)), ("x", ("k", "s")),
    ("y", ("j",)), ("z", ("z",)),
]

_PL_RULES = [
    ("szcz", ("ʃ", "tʃ")), ("sz", ("ʃ",)), ("cz", ("tʃ",)), ("rz", ("ʒ",)),
    ("dz", ("dz",)), ("dź", ("dʑ",)), ("dż", ("dʒ",)), ("ch", ("x",)),
    ("ci", ("tɕ", "i")), ("si", ("ɕ", "i")), ("zi", ("ʑ", "i")),
    ("ni", ("ɲ", "i")),
    ("ą", ("ɔ̃",)), ("ę", ("ɛ̃",)), ("ó", ("u",)), ("ł", ("w",)),
    ("ż", ("ʒ",)), ("ź", ("ʑ",)), ("ś", ("ɕ",)), ("ć", ("tɕ",)), ("ń", ("ɲ",)),
    ("w", ("v",)), ("y", ("ɨ",)), ("j", ("j",)), ("h", ("x",)),
    ("a", ("a",)), ("e", ("ɛ",)), ("i", ("i",)), ("o", ("ɔ",)), ("u", ("u",)),
    ("b", ("b",)), ("c", ("ts",)), ("d", ("d",)), ("f", ("f",)), ("g", ("ɡ",)),
    ("k", ("k",)), ("l", ("l",)), ("m", ("m",)), ("n", ("n",)), ("p", ("p",)),
    ("r", ("r",)), ("s", ("s",)), ("t", ("t",)), ("z", ("z",)),
]

_TR_RULES = [
    ("ç", ("tʃ",)), ("ş", ("ʃ",)), ("ğ", ()), ("ı", ("ɯ",)), ("ö", ("ø",)),
    ("ü", ("y",)), ("c", ("dʒ",)), ("j", ("ʒ",)), ("y", ("j",)),
    ("a", ("a",)), ("e", ("e",)), ("i", ("i",)), ("o", ("o",)), ("u", ("u",)),
    ("b", ("b",)), ("d", ("d",)), ("f", ("f",)), ("g", ("ɡ",)), ("h", ("h",)),
    ("k", ("k",)), ("l", ("l",)), ("m", ("m",)), ("n", ("n",)), ("p", ("p",)),
    ("r", ("ɾ",)), ("s", ("s",)), ("t", ("t",)), ("v", ("v",)), ("z", ("z",)),
]

_RU_RULES = [
    ("щ", ("ɕ",)), ("ш", ("ʂ",)), ("ж", ("ʐ",)), ("ч", ("tɕ",)),
    ("ц", ("ts",)), ("х", ("x",)),
    ("а", ("a",)), ("б", ("b",)), ("в", ("v",)), ("г", ("ɡ",)), ("д", ("d",)),
    ("е", ("j", "e")), ("ё", ("j", "o")), ("з", ("z",)), ("и", ("i",)),
    ("й", ("j",)), ("к", ("k",)), ("л", ("l",)), ("м", ("m",)), ("н", ("n",)),
    ("о", ("o",)), ("п", ("p",)), ("р", ("r",)), ("с", ("s",)), ("т", ("t",)),
    ("у", ("u",)), ("ф", ("f",)), ("ы", ("ɨ",)), ("э", ("ɛ",)),
    ("ю", ("j", "u")), ("я", ("j", "a")), ("ь", ()), ("ъ", ()),
]

_LANG_RULES: Dict[str, list] = {
    "es": _ES_RULES,
    "it": _IT_RULES,
    "de": _DE_RULES,
    "en": _EN_RULES,
    "fr": _FR_RULES,
    "pt": _PT_RULES,
    "nl": _NL_RULES,
    "pl": _PL_RULES,
    "tr": _TR_RULES,
    "ru": _RU_RULES,
}

_PUNCT_RE = re.compile(r"[^\w\s']", re.UNICODE)


def normalize_text(text: str) -> List[str]:
    """Lowercase, strip punctuation, NFC-normalize → word list."""
    text = unicodedata.normalize("NFC", text.lower())
    text = _PUNCT_RE.sub(" ", text)
    return text.split()


def word_to_ipa(word: str, rules: Sequence[tuple]) -> List[str]:
    out: List[str] = []
    i = 0
    while i < len(word):
        for g, phones in rules:
            if word.startswith(g, i):
                out.extend(phones)
                i += len(g)
                break
        else:
            i += 1  # unknown character: skip
    return out


def text_to_ipa(
    text: str,
    lang: str = "en",
    *,
    lexicon: Optional[Dict[str, Tuple[str, ...]]] = None,
    rules: Optional[Sequence[tuple]] = None,
    insert_word_breaks: bool = False,
) -> List[str]:
    """Sentence → flat IPA phone list (optionally with 'sil' between
    words). Unknown languages fall back to English rules."""
    rules = rules if rules is not None else _LANG_RULES.get(lang, _EN_RULES)
    lex = dict(_EN_LEXICON) if lang == "en" else {}
    if lexicon:
        lex.update(lexicon)
    phones: List[str] = []
    for w, word in enumerate(normalize_text(text)):
        if w and insert_word_breaks:
            phones.append("sil")
        if word in lex:
            phones.extend(lex[word])
        else:
            phones.extend(word_to_ipa(word, rules))
    return phones


def supported_languages() -> List[str]:
    return sorted(_LANG_RULES)
