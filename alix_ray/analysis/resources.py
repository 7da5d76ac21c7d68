"""Built-in lexical resources (mini versions of the reference's CSVs).

The reference loads large CSV resources (``fr/src/resources/.../fr/``:
``word.csv`` ~500k entries — a stripped blob in the reference repo —
``stopwords.csv``, ``mwe-words.csv``, ``norm-*.csv``, ``ucwords.csv``;
loaders at ``LexiconHelper.java:49``).  We ship compact built-in
equivalents with the same *shape* and the same loading conventions
(user-extensible via the same CSV format: ``#`` comments, header skip,
blank-key skip).

All resources are plain frozen dicts/sets built once at import — they
are broadcast implicitly by Ray when the analyzer actor class is
serialized, and live once per actor process (SURVEY.md §2.3).
"""

from __future__ import annotations

# ---- stop words (role of stopwords.csv; removal AFTER MWE merge) -----
STOPWORDS = frozenset(
    """
a à â ai aie aient aies ait as au aucun aujourd'hui auquel aura aurai auraient
aurais aurait auras aurez auriez aurions aurons auront aussi autre autres aux
auxquelles auxquels avaient avais avait avant avec avez aviez avions avons ayant
ayez ayons c c' ça car ce ceci cela celle celles celui cependant certain
certaine certaines certains ces cet cette ceux chaque chez comme comment d d'
dans de depuis des desquelles desquels deux devant doit donc dont du duquel
durant dès elle elles en encore enfin entre envers est et étaient étais était
étant été êtes être eu eux fait faite fois font fut hors ici il ils j j' je l
l' la laquelle le lequel les lesquelles lesquels leur leurs lors lorsque lui là
m m' ma mais me mes mien moi moins mon même n n' ne ni non nos notre nous on
ont ou où par parce pas pendant peu peut plus plusieurs pour pourquoi pourtant
près puis qu qu' quand que quel quelle quelles quels qui quoi s s' sa sans se
selon ses si sien son sont sous soi sur t t' ta te tes toi ton tous tout toute
toutes tu un une vers vos votre vous y
""".split()
)

# ---- lemma lexicon: surface form → (POS, lemma)  (role of word.csv) --
# POS tags follow UD/Upos names used by the reference (Upos.java).
_RAW_LEMMAS = {
    # auxiliaries (forms of être / avoir)
    "suis": ("AUX", "être"), "es": ("AUX", "être"), "est": ("AUX", "être"),
    "sommes": ("AUX", "être"), "êtes": ("AUX", "être"), "sont": ("AUX", "être"),
    "étais": ("AUX", "être"), "était": ("AUX", "être"), "étaient": ("AUX", "être"),
    "fut": ("AUX", "être"), "furent": ("AUX", "être"), "sera": ("AUX", "être"),
    "seront": ("AUX", "être"), "été": ("AUX", "être"), "étant": ("AUX", "être"),
    "ai": ("AUX", "avoir"), "as": ("AUX", "avoir"), "a": ("AUX", "avoir"),
    "avons": ("AUX", "avoir"), "avez": ("AUX", "avoir"), "ont": ("AUX", "avoir"),
    "avais": ("AUX", "avoir"), "avait": ("AUX", "avoir"), "avaient": ("AUX", "avoir"),
    "eut": ("AUX", "avoir"), "eurent": ("AUX", "avoir"), "aura": ("AUX", "avoir"),
    "auront": ("AUX", "avoir"), "eu": ("AUX", "avoir"), "ayant": ("AUX", "avoir"),
    # common verbs
    "fait": ("VERB", "faire"), "faisait": ("VERB", "faire"), "fit": ("VERB", "faire"),
    "font": ("VERB", "faire"), "faire": ("VERB", "faire"),
    "dit": ("VERB", "dire"), "disait": ("VERB", "dire"), "dire": ("VERB", "dire"),
    "va": ("VERB", "aller"), "vont": ("VERB", "aller"), "allait": ("VERB", "aller"),
    "vint": ("VERB", "venir"), "vient": ("VERB", "venir"), "venu": ("VERB", "venir"),
    "peut": ("VERB", "pouvoir"), "peuvent": ("VERB", "pouvoir"),
    "pouvait": ("VERB", "pouvoir"),
    "voit": ("VERB", "voir"), "vit": ("VERB", "voir"), "voyait": ("VERB", "voir"),
    "prend": ("VERB", "prendre"), "prit": ("VERB", "prendre"),
    "dort": ("VERB", "dormir"), "dormait": ("VERB", "dormir"),
    "restait": ("VERB", "rester"), "reste": ("VERB", "rester"),
    # determiners / pronouns / adpositions (1-char survivors need a POS:
    # CleanupFilter keeps 1-char tokens only for ADP/AUX/PRON/VERB)
    "le": ("DET", "le"), "la": ("DET", "le"), "les": ("DET", "le"),
    "un": ("DET", "un"), "une": ("DET", "un"), "des": ("DET", "un"),
    "du": ("DET", "du"), "au": ("DET", "au"), "aux": ("DET", "au"),
    "ce": ("PRON", "ce"), "cette": ("DET", "ce"), "ces": ("DET", "ce"),
    "il": ("PRON", "il"), "elle": ("PRON", "il"), "ils": ("PRON", "il"),
    "elles": ("PRON", "il"), "je": ("PRON", "je"), "tu": ("PRON", "tu"),
    "nous": ("PRON", "nous"), "vous": ("PRON", "vous"), "on": ("PRON", "on"),
    "se": ("PRON", "se"), "me": ("PRON", "me"), "te": ("PRON", "te"),
    "y": ("PRON", "y"), "en": ("ADP", "en"), "lui": ("PRON", "lui"),
    "moi": ("PRON", "moi"), "toi": ("PRON", "toi"), "eux": ("PRON", "eux"),
    "à": ("ADP", "à"), "de": ("ADP", "de"), "dans": ("ADP", "dans"),
    "par": ("ADP", "par"), "pour": ("ADP", "pour"), "sur": ("ADP", "sur"),
    "avec": ("ADP", "avec"), "sans": ("ADP", "sans"), "sous": ("ADP", "sous"),
    "et": ("CCONJ", "et"), "ou": ("CCONJ", "ou"), "mais": ("CCONJ", "mais"),
    "que": ("SCONJ", "que"), "qui": ("PRON", "qui"), "ne": ("ADV", "ne"),
    "pas": ("ADV", "pas"), "plus": ("ADV", "plus"), "très": ("ADV", "très"),
    # nouns with number inflection (plural → singular lemma)
    "analyses": ("NOUN", "analyse"), "analyse": ("NOUN", "analyse"),
    "enfants": ("NOUN", "enfant"), "enfant": ("NOUN", "enfant"),
    "mots": ("NOUN", "mot"), "mot": ("NOUN", "mot"),
    "livres": ("NOUN", "livre"), "livre": ("NOUN", "livre"),
    "années": ("NOUN", "année"), "année": ("NOUN", "année"),
}
LEMMA_LEXICON: dict[str, tuple[str, str]] = dict(_RAW_LEMMAS)

# ---- token normalization (role of norm-*.csv; whole-token 1→1) -------
NORMALIZATION = {
    "coeur": "cœur",
    "soeur": "sœur",
    "oeuvre": "œuvre",
    "oeuvres": "œuvres",
    "oeil": "œil",
    "grand'chose": "grand-chose",
    "aujourd'hui": "aujourd'hui",
}

# ---- protected all-caps words (role of ucwords.csv) ------------------
UCWORDS = frozenset("CNRS USA URSS UNESCO ONU SNCF RATP TGV ADN XIXE".split())

# ---- multi-word expressions (role of mwe-words.csv / mwe-propn.csv) --
# key: tuple of matched forms (lowercase); value: (canonical_term, POS).
# The canonical term joins components with '_' — the reference indexes
# MWEs as single terms queryable as "a_b" (SpanQueryParser.java:1-24).
MWE_FORM = {
    ("parce", "que"): ("parce_que", "SCONJ"),
    ("tout", "à", "fait"): ("tout_à_fait", "ADV"),
    ("bien", "que"): ("bien_que", "SCONJ"),
    ("afin", "de"): ("afin_de", "ADP"),
    ("au", "fur", "et", "à", "mesure"): ("au_fur_et_à_mesure", "ADV"),
    ("n'", "importe"): ("n'importe", "ADV"),
    ("chemin", "de", "fer"): ("chemin_de_fer", "NOUN"),
    ("pomme", "de", "terre"): ("pomme_de_terre", "NOUN"),
}
# lemma-path entries (match on lemma channel): inflection-independent
MWE_LEMMA = {
    ("avoir", "lieu"): ("avoir_lieu", "VERB"),
    ("mettre", "en", "œuvre"): ("mettre_en_œuvre", "VERB"),
}
