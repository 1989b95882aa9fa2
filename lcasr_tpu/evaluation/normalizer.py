"""Text normalization applied before WER scoring.

The reference normalizes hypotheses and references with Whisper's
EnglishTextNormalizer before scoring (reference `eval/run.py:9-10,91`),
constructed with openai-whisper's english.json British→American spelling
map.  transformers ships the same normalizer class but not the data file
(and this environment has no network), so the spelling map here is a
CURATED approximation: ~150 high-frequency base forms expanded over common
suffixes.  It is applied identically to hypothesis and reference, so it
only affects scoring when the two sides disagree on a spelling — exactly
the cases the reference's map exists to forgive.

A conservative fallback keeps eval functional if the transformers import
ever disappears — LOUDLY, because its scoring semantics are much weaker
(no number/contraction/abbreviation handling).
"""
from __future__ import annotations

import re

# base British → American forms; suffix expansion below adds s/ed/ing/er/ly
_SPELLING_BASE = {
    # -our → -or
    "colour": "color", "favour": "favor", "flavour": "flavor",
    "honour": "honor", "labour": "labor", "neighbour": "neighbor",
    "behaviour": "behavior", "humour": "humor", "rumour": "rumor",
    "armour": "armor", "harbour": "harbor", "odour": "odor",
    "vapour": "vapor", "savour": "savor", "endeavour": "endeavor",
    "vigour": "vigor", "rigour": "rigor", "splendour": "splendor",
    "valour": "valor", "candour": "candor", "clamour": "clamor",
    "glamour": "glamor", "saviour": "savior", "tumour": "tumor",
    "parlour": "parlor", "ardour": "ardor", "fervour": "fervor",
    # -re → -er
    "centre": "center", "theatre": "theater", "metre": "meter",
    "litre": "liter", "fibre": "fiber", "calibre": "caliber",
    "sombre": "somber", "spectre": "specter", "lustre": "luster",
    "manoeuvre": "maneuver", "meagre": "meager", "sabre": "saber",
    "mitre": "miter", "nitre": "niter", "louvre": "louver",
    # -ise/-yse → -ize/-yze (most common verbs)
    "organise": "organize", "recognise": "recognize", "realise": "realize",
    "apologise": "apologize", "criticise": "criticize",
    "emphasise": "emphasize", "minimise": "minimize",
    "maximise": "maximize", "optimise": "optimize", "analyse": "analyze",
    "paralyse": "paralyze", "catalyse": "catalyze",
    "specialise": "specialize", "summarise": "summarize",
    "authorise": "authorize", "capitalise": "capitalize",
    "categorise": "categorize", "characterise": "characterize",
    "civilise": "civilize", "colonise": "colonize",
    "commercialise": "commercialize", "customise": "customize",
    "democratise": "democratize", "dramatise": "dramatize",
    "economise": "economize", "equalise": "equalize",
    "familiarise": "familiarize", "fantasise": "fantasize",
    "finalise": "finalize", "generalise": "generalize",
    "harmonise": "harmonize", "hospitalise": "hospitalize",
    "hypothesise": "hypothesize", "idealise": "idealize",
    "immunise": "immunize", "industrialise": "industrialize",
    "internalise": "internalize", "legalise": "legalize",
    "localise": "localize", "materialise": "materialize",
    "memorise": "memorize", "mesmerise": "mesmerize",
    "mobilise": "mobilize", "modernise": "modernize",
    "monopolise": "monopolize", "moralise": "moralize",
    "nationalise": "nationalize", "neutralise": "neutralize",
    "normalise": "normalize", "penalise": "penalize",
    "personalise": "personalize", "philosophise": "philosophize",
    "polarise": "polarize", "popularise": "popularize",
    "prioritise": "prioritize", "privatise": "privatize",
    "publicise": "publicize", "rationalise": "rationalize",
    "revolutionise": "revolutionize", "satirise": "satirize",
    "scrutinise": "scrutinize", "sensationalise": "sensationalize",
    "socialise": "socialize", "stabilise": "stabilize",
    "standardise": "standardize", "sterilise": "sterilize",
    "stigmatise": "stigmatize", "subsidise": "subsidize",
    "sympathise": "sympathize", "synthesise": "synthesize",
    "terrorise": "terrorize", "theorise": "theorize",
    "utilise": "utilize", "vandalise": "vandalize",
    "visualise": "visualize", "vocalise": "vocalize",
    # -isation → -ization
    "organisation": "organization", "realisation": "realization",
    "civilisation": "civilization", "globalisation": "globalization",
    "specialisation": "specialization", "authorisation": "authorization",
    "categorisation": "categorization",
    "characterisation": "characterization",
    "generalisation": "generalization", "localisation": "localization",
    "mobilisation": "mobilization", "modernisation": "modernization",
    "nationalisation": "nationalization",
    "normalisation": "normalization", "optimisation": "optimization",
    "privatisation": "privatization", "stabilisation": "stabilization",
    "standardisation": "standardization", "utilisation": "utilization",
    "visualisation": "visualization",
    # -ogue → -og
    "catalogue": "catalog", "dialogue": "dialog", "analogue": "analog",
    "monologue": "monolog", "epilogue": "epilog", "prologue": "prolog",
    # -ence → -ense
    "defence": "defense", "offence": "offense", "pretence": "pretense",
    "licence": "license",
    # doubled consonants
    "travelled": "traveled", "travelling": "traveling",
    "traveller": "traveler", "cancelled": "canceled",
    "cancelling": "canceling", "labelled": "labeled",
    "labelling": "labeling", "modelled": "modeled",
    "modelling": "modeling", "signalled": "signaled",
    "signalling": "signaling", "counselled": "counseled",
    "counselling": "counseling", "counsellor": "counselor",
    "fuelled": "fueled", "fuelling": "fueling",
    "jewellery": "jewelry", "marvelled": "marveled",
    "marvellous": "marvelous", "quarrelled": "quarreled",
    "totalled": "totaled", "woollen": "woolen",
    # misc irregulars
    "grey": "gray", "programme": "program", "tyre": "tire",
    "kerb": "curb", "cheque": "check", "plough": "plow",
    "mould": "mold", "moustache": "mustache", "pyjamas": "pajamas",
    "sceptical": "skeptical", "sceptic": "skeptic", "ageing": "aging",
    "artefact": "artifact", "draught": "draft", "aluminium": "aluminum",
    "aeroplane": "airplane", "storey": "story", "whisky": "whiskey",
    "practise": "practice", "enrol": "enroll", "instalment": "installment",
    "fulfil": "fulfill", "skilful": "skillful", "wilful": "willful",
    "smoulder": "smolder", "sulphur": "sulfur", "archaeology": "archeology",
    "encyclopaedia": "encyclopedia", "anaemia": "anemia",
    "anaesthesia": "anesthesia", "paediatric": "pediatric",
    "mediaeval": "medieval", "oesophagus": "esophagus",
    "foetus": "fetus", "manoeuvres": "maneuvers",
}


def _expand_spelling(base: dict) -> dict:
    """Expand base pairs over common suffixes so inflected forms map too
    (whisper's english.json lists inflections explicitly; this generates
    them where the transformation commutes with the suffix)."""
    out = dict(base)
    for br, us in base.items():
        for suf in ("s", "d", "ed", "ing", "r", "er", "rs", "ers", "ly", "ment"):
            b2, u2 = br + suf, us + suf
            if br.endswith("e") and suf in ("ed", "ing", "er", "ers"):
                b2 = br[:-1] + suf
                u2 = us[:-1] + suf
            out.setdefault(b2, u2)
    return out


SPELLING = _expand_spelling(_SPELLING_BASE)


def _basic_normalize(text: str) -> str:
    text = text.lower()
    text = re.sub(r"[\(\[].*?[\)\]]", "", text)  # drop bracketed annotations
    text = re.sub(r"[^\w\s']", " ", text)
    return " ".join(text.split())


try:
    from transformers.models.whisper.english_normalizer import EnglishTextNormalizer

    _normalizer = EnglishTextNormalizer(SPELLING)

    def normalize(text: str) -> str:
        return _normalizer(text)

except Exception as _e:  # pragma: no cover - exercised only without transformers
    import warnings

    warnings.warn(
        f"Whisper EnglishTextNormalizer unavailable ({_e!r}); WER scoring "
        f"falls back to a much weaker normalizer (no number/contraction/"
        f"abbreviation handling) — results are NOT comparable to runs on a "
        f"healthy install",
        stacklevel=2,
    )

    def normalize(text: str) -> str:
        return _basic_normalize(text)
