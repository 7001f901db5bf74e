"""Every phone producible by any G2P rule set must get a real (non-
silence) binf feature vector — the invariant that makes multilingual
binf transfer work."""

from phones_las_tpu.data.g2p import _LANG_RULES, _EN_LEXICON, text_to_ipa, supported_languages
from phones_las_tpu.data.ipa import phone_to_binf


def test_all_rule_phones_have_features():
    phones = set()
    for rules in _LANG_RULES.values():
        for _, ps in rules:
            phones.update(ps)
    for ps in _EN_LEXICON.values():
        phones.update(ps)
    missing = sorted(
        p for p in phones if phone_to_binf(p) == ("silence",)
    )
    assert not missing, f"phones without binf features: {missing}"


def test_new_languages_produce_phones():
    samples = {
        "fr": "bonjour le monde",
        "pt": "bom dia mundo",
        "nl": "goede morgen wereld",
        "pl": "dzień dobry świecie",
        "tr": "günaydın dünya",
        "ru": "доброе утро мир",
    }
    for lang, text in samples.items():
        assert lang in supported_languages()
        phones = text_to_ipa(text, lang)
        assert len(phones) >= 5, (lang, phones)
        assert all(phone_to_binf(p) != ("silence",) for p in phones), (lang, phones)
