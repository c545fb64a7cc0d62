"""Deterministic synthetic `pages` corpus generator.

Produces Common-Crawl-style rows matching BASELINE.json:input_hint:

    pages(url string, warc_ts timestamp, html binary, text string, lang string)

The corpus is the test substrate for the whole engine (FIXTURES.md §1):
seeded (seed=42 by default), Zipfian over ~50 domains so one heavy domain
exists (skew/salting tests), and salted with planted artifact documents that
exercise every reference cleaning rule family (FIXTURES.md §3). Document
bodies mimic the reference's input convention -- a ``Title:/Source:/
Category:/Text Type:`` header, a dash separator, then body text (see the
sample corpus file ``Text Cleaner/Texts to be Cleaned/Allegorica expositio
in Cantica canticorum.txt`` lines 1-6).

Pure Python + stdlib ``random.Random`` -- no Spark dependency -- so the same
rows can be generated driver-side, inside tests, and by the reference-oracle
golden generator.
"""

from __future__ import annotations

import datetime as _dt
import random
from dataclasses import dataclass

# --------------------------------------------------------------------------
# Word pools
# --------------------------------------------------------------------------

LATIN_WORDS = (
    "et in de ad cum ex pro per ab rex deus homo populus senatus imperium "
    "bellum pax terra caelum aqua ignis vita mors tempus annus dies nox "
    "urbs domus via mare mons silva ager liber verbum nomen corpus animus "
    "virtus gloria honor fides spes amor ira timor gaudium dolor labor "
    "opus manus caput oculus vox mens ratio causa res modus locus pars "
    "genus finis initium medium magnus parvus bonus malus novus vetus "
    "longus brevis altus omnis nullus multus paucus primus ultimus verus "
    "falsus sanctus dominus ecclesia episcopus monachus regnum consul "
    "miles dux populo romano quod quia quoniam igitur autem enim tamen "
    "etiam quoque sed non nec atque aut vel si dum ut ne quam iam tunc "
    "nunc semper numquam saepe statim deinde postea antea ibi ubi unde "
    "quo hic ille iste ipse idem alius alter uterque quisque"
).split()

EN_WORDS = (
    "the of and to in is was for that with his they this have from one had "
    "word but what some can out other were all there when your how said an "
    "each she which their time will way about many then them would write"
).split()

DE_WORDS = (
    "der die und das ist von mit nicht ein eine sich auch auf werden bei "
    "einer nach wie über durch wenn aber mehr diese zum haben wird sind"
).split()

FR_WORDS = (
    "le la les des une dans est pour que qui avec sur pas plus par mais "
    "comme tout nous vous sont cette bien sans peut après autre leur très"
).split()

ES_WORDS = (
    "el la los las una en es para que con por como más pero sus este cuando "
    "hasta desde está todo ser fue entre sin sobre también había muy años"
).split()

ZH_CHARS = "的一是不了人我在有他这为之大来以个中上们到说国和地也子时道出而要于就下得可你年生"

WORD_POOLS = {
    "la": LATIN_WORDS,
    "en": EN_WORDS,
    "de": DE_WORDS,
    "fr": FR_WORDS,
    "es": ES_WORDS,
}

#: Zipf-ish language mix for body text (ground-truth labels)
LANG_WEIGHTS = (("la", 50), ("en", 20), ("de", 10), ("fr", 8), ("es", 8), ("zh", 4))

CATEGORIES = (
    "Latinitas_Romana", "Latinitas_Mediaevalis", "Saeculum_12",
    "Latinitas_Christiana", "Opera_Poetica",
)

TEXT_TYPES = ("prose", "poetry", "mixed")

TITLE_STEMS = (
    "De bello", "Carmen de", "Historia", "Epistola ad", "Vita sancti",
    "Commentarii de", "Oratio in", "Tractatus de", "Liber", "Annales",
)

TITLE_TAILS = (
    "gallico", "civili", "amore", "natura rerum", "urbe condita",
    "trinitate", "officiis", "amicitia", "senectute", "re publica",
)

#: Fragments planted mid-document to exercise specific scrub rules
ARTIFACT_SNIPPETS = (
    "Ætas ﬁdes quæ œconomia & deus est",
    "michi nichil dampnum tercius pena quedam",
    "Vrbs Jam capta est ſic scriptum",
    "verbum[12] aliud(3) [sic] [lacuna] notatum est",
    "vide https://example.org/liber/12 pro fonte",
    "'''fortis''' miles ''celeriter'' venit [[Roma|urbem]] {{templum}}",
    "ā ē ī ō ū sunt vocales longae hīc",
    "Q. Fabius Maximus pater consul P. Cornelius Scipio vir",
    "textus .... multis,,, signis;;; notatus est",
    "contact admin@example.com vel 4111111111111111 numerus",
)

#: Line-sets that make a document look like an index/TOC (step1 semantics)
INDEX_LINES = tuple(
    f"Liber {r}." for r in ("I", "II", "III", "IV", "V", "VI", "VII", "VIII")
) + tuple(f"Caput {n}" for n in ("IX", "X", "XI", "XII")) + (
    "* prooemium", "* argumentum", "* conclusio", "12", "34", "56",
)


@dataclass(frozen=True)
class PageRow:
    url: str
    warc_ts: _dt.datetime
    html: bytes
    text: str
    lang: str


_EPOCH = _dt.datetime(2024, 1, 1, 0, 0, 0)


def _pick_lang(rng: random.Random) -> str:
    total = sum(w for _, w in LANG_WEIGHTS)
    x = rng.randrange(total)
    for lang, w in LANG_WEIGHTS:
        if x < w:
            return lang
        x -= w
    return "la"


def _sentence(rng: random.Random, lang: str, lo: int = 6, hi: int = 14) -> str:
    if lang == "zh":
        return "".join(rng.choice(ZH_CHARS) for _ in range(rng.randint(8, 24))) + "。"
    pool = WORD_POOLS[lang]
    words = [rng.choice(pool) for _ in range(rng.randint(lo, hi))]
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


def _paragraph(rng: random.Random, lang: str, sentences: int) -> str:
    return " ".join(_sentence(rng, lang) for _ in range(sentences))


def _poetry_block(rng: random.Random, lines: int) -> str:
    out = []
    for _ in range(lines):
        n = rng.randint(4, 7)
        out.append(" ".join(rng.choice(LATIN_WORDS) for _ in range(n)))
    return "\n".join(out)


def _header(rng: random.Random, title: str, url: str) -> str:
    lines = [
        f"Title: {title}",
        f"Source: {url}",
        f"Category: {rng.choice(CATEGORIES)}",
        f"Text Type: {rng.choice(TEXT_TYPES)}",
        "-" * 50,
    ]
    return "\n".join(lines)


def _zipf_domain(rng: random.Random, n_domains: int = 50) -> str:
    # Zipf(1.2)-ish: domain k chosen with weight 1/(k+1)^1.2 -> domain 0 is
    # the heavy hitter that skew handling must defuse.
    weights = [1.0 / (k + 1) ** 1.2 for k in range(n_domains)]
    total = sum(weights)
    x = rng.random() * total
    for k, w in enumerate(weights):
        if x < w:
            return f"site{k:02d}.example"
        x -= w
    return "site00.example"


def _wrap_html(text: str) -> bytes:
    body = text.replace("\n", "<br/>\n")
    return (
        "<html><head><title>doc</title></head><body>\n"
        f"<div class='content'>{body}</div>\n"
        "<footer>Exported from Wikisource</footer></body></html>"
    ).encode("utf-8")


def generate_pages(n_rows: int, seed: int = 42) -> list[PageRow]:
    """Generate ``n_rows`` deterministic page rows.

    Document shapes (cycled by per-row draw):
      - normal Latin prose/poetry with header + a planted artifact snippet
      - non-Latin documents (en/de/fr/es/zh)
      - index/TOC documents (droppable, step1 semantics)
      - too-short documents (droppable, <200 bytes)
      - shrinks-below-50-chars documents (droppable post-clean)
      - footer/category-tail documents
    """
    rng = random.Random(seed)
    rows: list[PageRow] = []
    for i in range(n_rows):
        domain = _zipf_domain(rng)
        title = f"{rng.choice(TITLE_STEMS)} {rng.choice(TITLE_TAILS)}"
        slug = title.lower().replace(" ", "_")
        url = f"https://{domain}/wiki/{slug}_{i}"
        lang = _pick_lang(rng)
        shape = rng.randrange(100)

        if shape < 6:  # too-short document (Latin-ish content regardless of draw)
            lang = "la"
            body = _sentence(rng, "la", 3, 6)
            text = body if rng.random() < 0.5 else _header(rng, title, url) + "\n" + body
        elif shape < 12:  # index/TOC document
            lang = "la"
            lines = list(INDEX_LINES)
            rng.shuffle(lines)
            text = _header(rng, title, url) + "\n" + "\n".join(lines)
        elif shape < 16:  # shrinks to nothing after scrub
            lang = "la"
            junk = ["=== Sectio ===", "__TOC__", "[[Categoria:Test]]",
                    "12.", "IV.", "FINIS", "* * *", "{{navbox}}",
                    "Categoria: Latinitas", "1453"]
            rng.shuffle(junk)
            text = _header(rng, title, url) + "\n" + "\n".join(junk)
        elif lang == "la":
            paras = [_paragraph(rng, "la", rng.randint(2, 5)) for _ in range(rng.randint(3, 8))]
            if rng.random() < 0.6:
                paras.insert(rng.randrange(len(paras)), rng.choice(ARTIFACT_SNIPPETS))
            if rng.random() < 0.3:
                paras.append(_poetry_block(rng, rng.randint(4, 10)))
            body = "\n\n".join(paras)
            if rng.random() < 0.4:
                body += (
                    "\n\nAbout this digital edition\n"
                    "This text was produced by OCR volunteers.\n"
                    "Categoria: Latinitas_Mediaevalis\nCategoria: Saeculum_12"
                )
            text = _header(rng, title, url) + "\n" + body
        else:  # modern-language document
            paras = [_paragraph(rng, lang, rng.randint(2, 4)) for _ in range(rng.randint(2, 6))]
            body = "\n\n".join(paras)
            text = _header(rng, title, url) + "\n" + body if rng.random() < 0.5 else body

        ts = _EPOCH + _dt.timedelta(seconds=i * 37 + (i % 11) * 13)
        rows.append(PageRow(url=url, warc_ts=ts, html=_wrap_html(text), text=text, lang=lang))
    return rows


PAGES_SCHEMA_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def pages_dataframe(spark, n_rows: int, seed: int = 42, partitions: int | None = None):
    """Materialize the synthetic corpus as a Spark DataFrame."""
    rows = [(r.url, r.warc_ts, r.html, r.text, r.lang) for r in generate_pages(n_rows, seed)]
    df = spark.createDataFrame(rows, schema=PAGES_SCHEMA_DDL)
    return df.repartition(partitions) if partitions else df


def write_pages_parquet(
    path: str, n_rows: int, seed: int = 42, row_group_size: int = 8192
) -> None:
    """Write the corpus to parquet via pyarrow (no Spark needed).

    Small row groups keep the file splittable: a Spark scan parallelizes at
    row-group granularity, so one big row group would serialize the read no
    matter how many cores are available.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = generate_pages(n_rows, seed)
    table = pa.table({
        "url": [r.url for r in rows],
        "warc_ts": pa.array([r.warc_ts for r in rows], type=pa.timestamp("us")),
        "html": pa.array([r.html for r in rows], type=pa.binary()),
        "text": [r.text for r in rows],
        "lang": [r.lang for r in rows],
    })
    pq.write_table(table, path, row_group_size=row_group_size)
