"""The classify_periods DuckDB oracle is a full SQL re-derivation of the
additive classifiers; pin it to classify_document on planted documents that
exercise every branch (the corpus itself only hits the no-header default
path)."""

import importlib.util
import os

import duckdb

from wikisource_latin_text_cleaner_spark.functions import classify as C

_ENTRY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "__spark_entry__.py")


def _oracle_sql():
    spec = importlib.util.spec_from_file_location("entry_mod_cls", _ENTRY)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m.oracle_sql()["classify_periods"]


POEM = "\n".join(["arma virumque cano troiae qui primus ab oris"[:45]] * 12)
PROSE = "\n".join(
    "gallia est omnis divisa in partes tres quarum unam incolunt belgae "
    "aliam aquitani tertiam qui ipsorum lingua celtae nostra."
    for _ in range(10)
)
CONNECTED = " ".join(["itaque igitur ergo autem enim nam sed at vero quidem"] * 30)

PLANTED = [
    "Title: Carmina\nSource: ws\n--\n" + POEM,
    "Title: Historia Romana\nCategory: latinitas_romana\n--\n" + PROSE,
    "Title: Vita Sancti Benedicti\nCategory: mediaevalis christiana\n--\n" + PROSE,
    "Title: De Bello Gallico\nText Type: Prose\n--\n" + POEM,   # metadata wins
    "Title: Aeneis\n--\n" + POEM,
    "Title: something aeneid something\n--\n" + "plain line.\n" * 3,
    "Title: the history of rome\n--\n" + "plain line.\n" * 3,
    "Title: catullus and pliny together\n--\n" + "pl.\n" * 3,   # both fallbacks fire
    "Title: unknown thing\n--\n" + "pl.\n" * 3,                 # all-zero -> prose
    "Title: Confessiones\nCategory: patristic\n--\n" + CONNECTED,
    "Title: Metamorphoses\n--\n" + POEM,
    "Title: Epistolae\n--\n" + CONNECTED,
    "Title: Comoedia plautina\n--\n" + PROSE,
    "Title: Seneca tragoedia\n--\n" + POEM,
    "no header at all\n" + POEM,
    "no header at all\n" + PROSE,
    "Title: Bellum civile\n" + "x" * 20,                        # no dash line
    "Title:\n--\nshort.",                                       # empty title
    "Text Type: poetry\n--\n" + PROSE,
    "Category: saeculum_ix\n--\n" + PROSE,
    POEM,
    PROSE,
    CONNECTED,
    "",
    "Title: sanctus georgius\n--\n" + "pl.\n" * 3,
    "--\nimmediate dash\n" + POEM,
    "   Title: padded header\n--\n" + PROSE,                    # strip-then-startswith
    "a\nb\nc\nd\ne\nf\ng\nh\ni\nj\nk\nl\nTitle: too late\n--\n" + PROSE,
    # structural-regex branches IN THE BODY (these caught a raw-string bug:
    # '\b' in a non-raw oracle string silently became a backspace char)
    "--\n" + "hic versus et carmen resonant in pagina nostra hodie.\n" * 8,
    "--\n" + "liber primus et oratio secunda de capitulum tertium scripta.\n" * 8,
    "--\n" + ("versus carmen hymn\n" * 4) + PROSE,   # poetry struct + prose shape
    # struct-DECISIVE docs: the regex hit is what breaks the scoring tie,
    # so a corrupted '\b' flips the label and fails this test
    "--\n" + "\n".join(
        ["versus brevis hic"[:15]] * 4
        + [(("longa linea " * 12).strip() + " carmen finis est.")[:150] + "."] * 6
    ),
    "--\n" + "\n".join(
        ["brevis hic est"[:14]] * 4
        + [(("itaque igitur ergo autem enim nam sed at vero quidem tamen "
             "etiam " * 2).strip() + " liber capitulum")[:150]] * 6
    ),
]


def test_classify_oracle_matches_python_on_planted_docs():
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    list(enumerate(PLANTED)))
    per_doc = _oracle_sql().replace(
        "SELECT period, genre, count(*) AS n_docs\n"
        "            FROM genre_lbl GROUP BY period, genre",
        "SELECT doc_id, period, genre FROM genre_lbl",
    )
    assert "doc_id, period, genre" in per_doc, "final-SELECT rewrite failed"
    got = {r[0]: (r[1], r[2]) for r in con.execute(per_doc).fetchall()}
    for i, d in enumerate(PLANTED):
        rec = C.classify_document(d)
        assert got[i] == (rec["period"], rec["genre"]), (i, d[:60])
