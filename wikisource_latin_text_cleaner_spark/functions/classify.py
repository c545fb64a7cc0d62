"""Period/genre scalar classifiers + metadata parsing (derived columns).

Re-expresses the reference's additive-scoring classifiers
(ref: Text Cleaner/step2_sort_by_period_genre.py):

  parse_header       <- parse_file_metadata        (:115-151)
  classify_period    <- classify_period_enhanced   (:153-254)
  classify_genre     <- classify_genre_enhanced    (:256-419)
  resolve_genre      <- metadata-vs-heuristic flow (:462-477)
  overall_confidence <- confidence tiering         (:483)

These produce the categorical partition columns (period, genre) that the
reference used as physical directories; in the Spark engine they are plain
columns (and optional write-partition keys). Pure Python; driven per-batch
from pandas UDFs.
"""

from __future__ import annotations

import re

_I = re.IGNORECASE

POETRY_TITLES = (
    "carmen", "carmina", "elegia", "elegiae", "versus", "aeneis",
    "metamorphoses", "ecloga", "eclogae", "georgica", "bucolica",
    "satirae", "satira", "hymnus", "hymni", "odes", "ode", "epigram",
    "epigramma", "liber carminum", "fasti", "tristia", "heroides",
)

PROSE_TITLES = (
    "historia", "historiae", "oratio", "orationes", "epistola", "epistolae",
    "commentarii", "annales", "bellum", "bella", "de ", "ad ", "vita", "vitae",
    "dialogus", "tractatus", "institutio", "naturalis historia", "confessiones",
    "civitate dei", "tusculanae", "rhetorica", "philosophia", "grammatica",
)

MIXED_TITLES = ("comoedia", "tragoedia", "fabula", "drama", "theatrum")

AUTHOR_GENRE = {
    "vergilius": "poetry", "ovidius": "poetry", "horatius": "poetry",
    "catullus": "poetry", "propertius": "poetry", "tibullus": "poetry",
    "lucretius": "poetry", "martialis": "poetry", "juvenalis": "poetry",
    "persius": "poetry", "statius": "poetry", "lucanus": "poetry",
    "silius": "poetry", "valerius flaccus": "poetry", "prudentius": "poetry",
    "cicero": "prose", "caesar": "prose", "livius": "prose", "tacitus": "prose",
    "plinius": "prose", "quintilianus": "prose", "suetonius": "prose",
    "sallustius": "prose", "nepos": "prose", "curtius": "prose",
    "augustinus": "prose", "hieronymus": "prose", "ambrosius": "prose",
    "seneca": "mixed", "apuleius": "mixed", "boethius": "mixed",
}

CLASSICAL_AUTHORS = (
    "cicero", "caesar", "livius", "vergilius", "ovidius", "horatius",
    "catullus", "propertius", "tibullus", "lucretius", "sallustius",
    "nepos", "tacitus", "plinius", "quintilianus", "suetonius",
    "juvenalis", "martialis", "persius", "statius", "lucanus",
    "silius", "valerius flaccus", "curtius", "seneca", "apuleius",
)

LATE_AUTHORS = (
    "augustinus", "hieronymus", "ambrosius", "prudentius", "boethius",
    "cassiodorus", "isidorus", "gregorius magnus",
)

MEDIEVAL_AUTHORS = (
    "beda", "alcuinus", "rabanus maurus", "hincmarus", "lupus",
    "thomas aquinas", "anselmus", "bernardus", "abelardus",
)

CLASSICAL_CATEGORY = (
    "latinitas_romana", "romana", "classical", "republic", "empire",
    "augustus", "imperial", "golden age", "silver age",
)

POSTCLASSICAL_CATEGORY = (
    "latinitas_mediaevalis", "mediaevalis", "medieval", "saeculum_",
    "christian", "christiana", "patristic", "carolingian", "scholastic",
)

CLASSICAL_VOCAB = (
    "imperium", "consulatus", "senatus", "populus romanus", "res publica",
    "caesar", "augustus", "pontifex maximus", "triumphus", "forum",
)

MEDIEVAL_VOCAB = (
    "christianus", "ecclesia", "sanctus", "monachus", "abbas", "episcopus",
    "baptismus", "sacramentum", "martyrium", "confessio", "divinus",
    "benedictus", "dominus", "iesu", "christi", "maria", "angelus",
)

PROSE_CONNECTORS = (
    "itaque", "igitur", "ergo", "autem", "enim", "nam", "sed", "at",
    "vero", "quidem", "tamen", "etiam", "quoque", "denique", "porro",
    "praeterea", "insuper", "deinde", "postea", "interim",
)

_TIERS = ("high", "medium", "low", "very_low")
_WORD = re.compile(r"\w+")
_POETRY_STRUCT = re.compile(r"\b(carmen|versus|metra|hymn|elegia)\b")
_PROSE_STRUCT = re.compile(r"\b(liber|capitulum|sectio|paragraph|oratio)\b")


def parse_header(text: str) -> dict:
    """Header struct from the first ~12 lines (ref :115-151)."""
    meta = {"title": None, "source": None, "category": None, "text_type": None}
    for i, raw in enumerate(text.split("\n")):
        if i > 11:
            break
        line = raw.strip()
        if line.startswith("Title:"):
            meta["title"] = line.replace("Title:", "").strip()
        elif line.startswith("Source:"):
            meta["source"] = line.replace("Source:", "").strip()
        elif line.startswith("Category:"):
            meta["category"] = line.replace("Category:", "").strip()
        elif line.startswith("Text Type:"):
            meta["text_type"] = line.replace("Text Type:", "").strip()
        elif line.startswith("--"):
            break
    return meta


def classify_period(title, category, content_sample=None):
    """(period, confidence) additive scorer (ref :153-254)."""
    score = {"classical": 0.0, "post_classical": 0.0}
    if category:
        cat = category.lower()
        score["classical"] += 5 * sum(1 for s in CLASSICAL_CATEGORY if s in cat)
        score["post_classical"] += 5 * sum(1 for s in POSTCLASSICAL_CATEGORY if s in cat)
    if title:
        low = title.lower()
        score["classical"] += 3 * sum(1 for a in CLASSICAL_AUTHORS if a in low)
        score["post_classical"] += 3 * sum(1 for a in LATE_AUTHORS if a in low)
        score["post_classical"] += 3 * sum(1 for a in MEDIEVAL_AUTHORS if a in low)
    if content_sample:
        low = content_sample.lower()
        c = sum(1 for w in CLASSICAL_VOCAB if w in low)
        if c:
            score["classical"] += min(c * 0.5, 2)
        m = sum(1 for w in MEDIEVAL_VOCAB if w in low)
        if m:
            score["post_classical"] += min(m * 0.5, 2)
    if title and max(score.values()) == 0:
        low = title.lower()
        if any(p in low for p in ("ab urbe condita", "bellum", "historia", "commentarii")):
            score["classical"] += 1
        if any(p in low for p in ("sanctus", "vita", "martyrium", "confessio")):
            score["post_classical"] += 1

    if score["classical"] >= score["post_classical"]:
        label, s = "classical", score["classical"]
    else:
        label, s = "post_classical", score["post_classical"]
    conf = "high" if s >= 3 else "medium" if s >= 1 else "low"

    if max(score.values()) == 0 and title:
        low = title.lower()
        if any(t in low for t in ("aeneis", "metamorphoses", "cicero", "caesar")):
            label, conf = "classical", "low"
        elif any(t in low for t in ("saint", "sanctus", "church", "god", "jesus")):
            label, conf = "post_classical", "low"
        else:
            label, conf = "classical", "very_low"
    return label, conf


def _body_sample(text: str, n_lines: int = 100) -> str:
    lines = text.split("\n")
    start = 0
    for i, ln in enumerate(lines):
        if ln.strip().startswith("--"):
            start = i + 1
            break
    return "\n".join(lines[start: start + n_lines])


def classify_genre(title, content_sample):
    """(genre, confidence) additive scorer (ref :256-419)."""
    score = {"poetry": 0.0, "prose": 0.0, "mixed": 0.0}
    if title:
        low = title.lower()
        score["poetry"] += 3 * sum(1 for s in POETRY_TITLES if s in low)
        score["prose"] += 3 * sum(1 for s in PROSE_TITLES if s in low)
        score["mixed"] += 3 * sum(1 for s in MIXED_TITLES if s in low)
        for author, genre in AUTHOR_GENRE.items():
            if author in low:
                score[genre] += 2

    if content_sample:
        lines = [ln.strip() for ln in content_sample.split("\n") if ln.strip()]
        if len(lines) > 5:
            short = sum(1 for ln in lines if 20 <= len(ln) <= 80)
            very_short = sum(1 for ln in lines if 10 <= len(ln) < 30)
            long_l = sum(1 for ln in lines if len(ln) > 100)
            if very_short > len(lines) * 0.3:
                score["poetry"] += 2
            if short > long_l * 2:
                score["poetry"] += 1
            if long_l > len(lines) * 0.2:
                score["prose"] += 2
            non_period = sum(1 for ln in lines if ln and not ln.endswith("."))
            period_end = sum(1 for ln in lines if ln.endswith("."))
            if non_period > period_end * 2:
                score["poetry"] += 1
            if period_end > non_period:
                score["prose"] += 1
            low = content_sample.lower()
            words = len(_WORD.findall(content_sample))
            if words > 0:
                conn = sum(low.count(c) for c in PROSE_CONNECTORS)
                if conn > words // 100:
                    score["prose"] += 1
            if _POETRY_STRUCT.search(low):
                score["poetry"] += 1
            if _PROSE_STRUCT.search(low):
                score["prose"] += 1
            hexish = sum(
                1 for ln in lines[:20] if 30 <= len(ln) <= 60 and not ln.endswith(".")
            )
            if hexish > len(lines[:20]) * 0.4:
                score["poetry"] += 1

    if max(score.values()) == 0 and title:
        low = title.lower()
        if any(w in low for w in ("aeneid", "metamorphoses", "odes", "satires", "elegies")):
            score["poetry"] += 1
        elif any(w in low for w in ("history", "letters", "orations", "commentaries", "tusculan")):
            score["prose"] += 1
        else:
            if any(a in low for a in ("catullus", "tibullus", "propertius", "martial")):
                score["poetry"] += 1
            for a in ("pliny", "tacitus", "suetonius"):
                if a in low:
                    score["prose"] += 1
                    break

    top = max(score.values())
    if score["poetry"] == top and top > 0:
        label = "poetry"
    elif score["prose"] == top and top > 0:
        label = "prose"
    elif score["mixed"] == top and top > 0:
        label = "mixed"
    else:
        label, top = "prose", 0.5
    conf = (
        "high" if top >= 4 else "medium" if top >= 2 else "low" if top >= 1 else "very_low"
    )
    return label, conf


def resolve_genre(meta: dict, text: str):
    """Metadata-first genre resolution (ref :462-477)."""
    genre = meta.get("text_type")
    if genre and genre.lower() in ("prose", "poetry", "mixed"):
        return genre.lower(), "high", "metadata"
    label, conf = classify_genre(meta.get("title"), _body_sample(text))
    return label, conf, "heuristic"


def overall_confidence(period_conf: str, genre_conf: str) -> str:
    """min tier, collapsing any very_low to low (ref :483)."""
    if period_conf == "very_low" or genre_conf == "very_low":
        return "low"
    return min(period_conf, genre_conf, key=_TIERS.index)


def classify_document(text: str) -> dict:
    """Full classification record for one raw document."""
    meta = parse_header(text)
    period, period_conf = classify_period(meta.get("title"), meta.get("category"))
    genre, genre_conf, source = resolve_genre(meta, text)
    return {
        "title": meta["title"],
        "source": meta["source"],
        "category": meta["category"],
        "text_type": meta["text_type"],
        "period": period,
        "period_confidence": period_conf,
        "genre": genre,
        "genre_confidence": genre_conf,
        "genre_source": source,
        "confidence": overall_confidence(period_conf, genre_conf),
    }
