"""Deterministic synthetic ``pages`` corpus (BASELINE.json input_hint).

Schema: ``url:string, warc_ts:timestamp, html:binary, text:string,
lang:string`` — ``html`` holds either a generated PDF (resume-like, via
kernels.pdf_gen) or generated HTML (article-like with boilerplate
chrome); ``text`` is the *expected* extracted main text, the
byte-identity oracle per url.

Everything is a pure function of ``doc_id`` (seeded ``random.Random``),
so goldens are derivable anywhere — generation runs distributed inside
``mapInPandas`` (no driver-side loops), and the same function builds
pytest fixtures.

Skew: domains are Zipf-like; one hot domain ("bigcorp.example") takes
~20% of rows to make the salted-repartition defense measurable
(FIXTURES.md §1). ~2% of urls get a duplicate row with a later
``warc_ts`` and variant content, exercising latest-wins dedup
(replace-on-key semantics of
/root/reference/app/services/resume_service.py:106-182).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone
from typing import Iterator

from ..kernels.pdf_gen import make_pdf

__all__ = ["synth_doc", "fixture_rows", "build_pages_df", "PAGES_SCHEMA",
           "EDGE_URLS"]

# single source of truth for the pages shape: the canonical StructType
# in schema.py (a hand-maintained DDL twin here had to be kept in sync
# by eye; mapInPandas takes the StructType directly)
from ..schema import PAGES_SCHEMA  # noqa: E402  (re-export)

_EPOCH = datetime(2024, 3, 1, tzinfo=timezone.utc)

_FIRST = ["John", "Maria", "Wei", "Aisha", "Luca", "Elena", "Ravi", "Sofia",
          "Kofi", "Hana", "Pedro", "Nora", "Ivan", "Lena", "Omar", "Julia"]
_LAST = ["Doe", "Rossi", "Chen", "Khan", "Bianchi", "Garcia", "Patel",
         "Novak", "Mensah", "Sato", "Silva", "Weber", "Petrov", "Moreau"]
_CITIES = [("Dublin", "Ireland"), ("Milan", "Italy"), ("Berlin", "Germany"),
           ("Madrid", "Spain"), ("Lyon", "France"), ("Austin", "USA"),
           ("Toronto", "Canada"), ("Osaka", "Japan")]
_LEVELS = ["Bachelor", "Master", "PhD", "Diploma", "MSc", "BSc"]
_FIELDS = ["Computer Science", "Data Engineering", "Physics", "Economics",
           "Mathematics", "Electrical Engineering", "Design"]
_SCHOOLS = ["University of Genoa", "TU Berlin", "Trinity College",
            "Politecnico di Milano", "ETH Zurich", "University of Austin"]
_POSITIONS = ["Software Engineer", "Data Engineer", "Web Developer",
              "Analyst", "Site Reliability Engineer", "ML Engineer"]
_COMPANIES = ["Acme Corp", "Globex", "Initech", "Umbrella Labs",
              "Stark Industries", "Wayne Enterprises", "Hooli"]
_SKILLS = ["python", "spark", "sql", "airflow", "kafka", "docker",
           "kubernetes", "scala", "rust", "terraform", "dbt", "flink"]
_LANGS = [("English", "Fluent"), ("Italian", "Native"), ("German", "B2"),
          ("Spanish", "C1"), ("French", "A2"), ("Japanese", "N3")]
_INTERESTS = ["chess", "climbing", "photography", "cycling", "cooking",
              "sailing", "running", "painting"]
_WORDS = ("the fast key order sort table scan merge part window small hash "
          "join batch stream spark shuffle broadcast filter column row "
          "page text data byte codec vector token block index cache commit "
          "snapshot lineage audit skew salt partition executor driver").split()
_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep",
           "Oct", "Nov", "Dec"]

# domain table: index 0 is the hot domain (~20% of rows)
_DOMAINS = (["bigcorp.example"] +
            [f"site{i:02d}.example" for i in range(1, 40)])

_LANG_WHEEL = ["en", "en", "en", "en", "it", "it", "de", "es", "zh"]

EDGE_URLS = {
    "minimal": "urn:fixture:minimal-pdf",
    "oversize": "urn:fixture:oversize",
    "bad_magic": "urn:fixture:bad-magic",
    "truncated": "urn:fixture:truncated-pdf",
    "six_pages": "urn:fixture:six-pages",
    "links": "urn:fixture:links",
    "encrypted": "urn:fixture:encrypted-pdf",
    "locked": "urn:fixture:locked-pdf",
}


def _pick_domain(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.20:
        return _DOMAINS[0]
    # Zipf-ish tail over the remaining 39 domains
    idx = 1 + min(38, int((1.0 / (0.02 + rng.random())) - 1) % 39)
    return _DOMAINS[idx]


def _resume_text(rng: random.Random) -> tuple[str, list[str]]:
    """Generate resume text in the shapes resume_map parses, plus links."""
    first = rng.choice(_FIRST)
    last = rng.choice(_LAST)
    city, country = rng.choice(_CITIES)
    email = f"{first.lower()}.{last.lower()}{rng.randrange(100)}@mail.example"
    phone = f"{rng.randrange(100, 999)} {rng.randrange(100, 999)} {rng.randrange(1000, 9999)}"
    prefix = f"+{rng.randrange(1, 99)}"
    gh = f"https://github.com/{first.lower()}{last.lower()}"
    li = f"https://linkedin.com/in/{first.lower()}-{last.lower()}"
    links = [gh, li]

    head = [f"{first} {last}", f"{city}, {country}",
            f"Email: {email}", f"Phone: {prefix} {phone}"]

    edu_blocks = []
    for _ in range(rng.randrange(1, 3)):
        level = rng.choice(_LEVELS)
        field = rng.choice(_FIELDS)
        school = rng.choice(_SCHOOLS)
        y0 = rng.randrange(2008, 2018)
        y1 = y0 + rng.randrange(2, 6)
        grade = f"{rng.randrange(60, 110)}/110"
        lines = [f"{level} in {field}", school, f"{y0} - {y1}",
                 f"Grade: {grade}"]
        if rng.random() < 0.4:  # exercise the exam map<string,string>
            for mod in rng.sample(_FIELDS, 2):
                lines.append(f"Exam {mod}: {rng.randrange(18, 31)}/30")
        edu_blocks.append("\n".join(lines))
    if rng.random() < 0.3:
        edu_blocks.append("Merit Scholarship: awarded for academic excellence")

    exp_blocks = []
    for _ in range(rng.randrange(1, 4)):
        pos = rng.choice(_POSITIONS)
        comp = rng.choice(_COMPANIES)
        m0, m1 = rng.choice(_MONTHS), rng.choice(_MONTHS)
        y0 = rng.randrange(2015, 2022)
        y1 = y0 + rng.randrange(1, 4)
        bullets = [f"- {' '.join(rng.choice(_WORDS) for _ in range(6))}"
                   for _ in range(rng.randrange(1, 4))]
        skills = ", ".join(rng.sample(_SKILLS, rng.randrange(2, 5)))
        exp_blocks.append("\n".join(
            [f"{pos} at {comp}", f"{m0} {y0} - {m1} {y1}"] + bullets +
            [f"Skills: {skills}"]))

    proj_name = f"Project {rng.choice(_WORDS).title()}{rng.randrange(10)}"
    proj = "\n".join([
        f"{proj_name}: {' '.join(rng.choice(_WORDS) for _ in range(8))}",
        f"Link: https://github.com/{first.lower()}/{proj_name.split()[-1].lower()}"])

    langs = ["{}: {}".format(*l) for l in
             rng.sample(_LANGS, rng.randrange(1, 4))]
    interests = [f"- {i}" for i in
                 rng.sample(_INTERESTS, rng.randrange(2, 5))]

    sections = ["\n".join(head),
                "EDUCATION\n" + "\n\n".join(edu_blocks),
                "EXPERIENCE\n" + "\n\n".join(exp_blocks),
                "PROJECTS\n" + proj,
                "LANGUAGES\n" + "\n".join(langs),
                "INTERESTS\n" + "\n".join(interests)]
    return "\n\n".join(sections), links


def _article_text(rng: random.Random) -> list[str]:
    """Paragraphs of filler words (HTML 'article' docs)."""
    return [" ".join(rng.choice(_WORDS) for _ in range(rng.randrange(12, 40)))
            for _ in range(rng.randrange(2, 6))]


def _pdf_pages_from_text(text: str, max_lines: int = 36) -> list[str]:
    """Split resume text into page texts; blank lines inside a page are
    encoded as single-space lines (a text run must exist for the layout
    parser to reproduce the line — see pdf_gen module docstring)."""
    blocks = text.split("\n\n")
    pages: list[list[str]] = [[]]
    count = 0
    for b in blocks:
        lines = b.split("\n")
        if count and count + len(lines) > max_lines:
            pages.append([])
            count = 0
        pages[-1].append(b)
        count += len(lines) + 1
    return ["\n \n".join(p) for p in pages]


def _html_doc(rng: random.Random, paragraphs: list[str]) -> bytes:
    navs = "".join(f'<li><a href="/p{i}">{rng.choice(_WORDS)}</a></li>'
                   for i in range(rng.randrange(3, 8)))
    side = " ".join(f'<a href="/t{i}">{rng.choice(_WORDS)}</a>'
                    for i in range(rng.randrange(3, 9)))
    body = "".join(f"<p>{p}</p>" for p in paragraphs)
    return (f"<!DOCTYPE html><html><head><title>{rng.choice(_WORDS)}</title>"
            f"<style>p{{margin:0}}</style></head><body>"
            f"<nav><ul>{navs}</ul></nav>"
            f"<header><h1><a href=\"/\">{rng.choice(_WORDS)} site</a></h1></header>"
            f"<aside>{side}</aside>"
            f"<article>{body}</article>"
            f"<footer><p>contact &amp; legal <a href=\"/tos\">tos</a></p></footer>"
            f"</body></html>").encode("utf-8")


def synth_doc(doc_id: int, dup: bool = False) -> dict:
    """Pure function doc_id -> pages row (dict). ``dup=True`` yields the
    later-timestamp variant of the same url (latest-wins dedup rows)."""
    rng = random.Random(doc_id * 1_000_003 + (7 if dup else 0))
    domain = _pick_domain(random.Random(doc_id * 97 + 13))
    url = f"https://{domain}/doc/{doc_id}"
    lang = _LANG_WHEEL[doc_id % len(_LANG_WHEEL)]
    ts = _EPOCH + timedelta(seconds=doc_id % 2_592_000,
                            hours=(6 if dup else 0))
    if doc_id % 10 < 3:  # 30% PDFs (resumes); mix of file layouts
        text, links = _resume_text(rng)
        html = make_pdf(_pdf_pages_from_text(text), links,
                        xref_stream=doc_id % 10 < 2,   # PDF 1.5 xref stream
                        objstm=doc_id % 10 == 0)       # + object stream
        if doc_id % 10 == 1:
            # 1/3 of PDFs are "encrypted but openable" (owner-locked,
            # empty user password) — the common crawl shape; the text
            # byte-identity contract is unchanged because extract_pdf
            # decrypts (kernels/pdf_crypt.py). Mode cycles all four
            # standard-handler generations.
            from ..kernels.pdf_crypt import encrypt_pdf
            html = encrypt_pdf(html, ("rc4-40", "rc4-128", "aes-128",
                                      "aes-256")[(doc_id // 10) % 4])
    else:  # 70% HTML articles
        paragraphs = _article_text(rng)
        text = "\n".join(paragraphs)
        html = _html_doc(rng, paragraphs)
    return {"url": url, "warc_ts": ts, "html": html, "text": text,
            "lang": lang}


def fixture_rows() -> list[dict]:
    """Edge-case rows (FIXTURES.md §1), reserved ``urn:fixture:`` urls."""
    ts = _EPOCH
    # 1-page valid PDF with no text ops (spirit of the reference's inline
    # minimal fixture, /root/reference/app/tests/conftest.py:169-192)
    minimal = make_pdf([""])
    six = make_pdf([f"Page {i} body" for i in range(1, 7)])
    linked = make_pdf(["Links page"],
                      ["https://github.com/fixture",
                       "https://linkedin.com/in/fixture"])
    truncated = make_pdf(["will be truncated"])[:120]
    from ..kernels.pdf_crypt import encrypt_pdf
    # owner-locked, empty user password: must extract byte-identically
    encrypted = encrypt_pdf(make_pdf(["Encrypted page body"]), "aes-128")
    # real user password: must fail loudly into FileProcessingError
    locked = encrypt_pdf(make_pdf(["secret"]), "rc4-128",
                         user_pw=b"fixture-password")
    rows = [
        {"url": EDGE_URLS["minimal"], "html": minimal, "text": ""},
        {"url": EDGE_URLS["oversize"], "html": b"%PDF-1.4\n" + b"\x00" * (10 * 1024 * 1024 + 1), "text": ""},
        {"url": EDGE_URLS["bad_magic"], "html": b"\x89PNG\r\n\x1a\n notapdf", "text": ""},
        {"url": EDGE_URLS["truncated"], "html": truncated, "text": ""},
        {"url": EDGE_URLS["six_pages"], "html": six,
         "text": "\n\n".join(f"Page {i} body" for i in range(1, 7))},
        {"url": EDGE_URLS["links"], "html": linked, "text": "Links page"},
        {"url": EDGE_URLS["encrypted"], "html": encrypted,
         "text": "Encrypted page body"},
        {"url": EDGE_URLS["locked"], "html": locked, "text": ""},
    ]
    for r in rows:
        r.setdefault("warc_ts", ts)
        r.setdefault("lang", "en")
    return rows


def build_pages_df(spark, n_docs: int, with_fixtures: bool = True,
                   dup_every: int = 50, partitions: int | None = None):
    """Build the synthetic pages DataFrame distributed (mapInPandas over
    a range of ids — no driver-side generation loop)."""
    import pandas as pd

    base = spark.range(0, n_docs,
                       numPartitions=partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["id"]:
                d = int(doc_id)
                rows.append(synth_doc(d))
                if dup_every and d % dup_every == 1:
                    rows.append(synth_doc(d, dup=True))
            out = pd.DataFrame(rows,
                               columns=["url", "warc_ts", "html", "text", "lang"])
            out["warc_ts"] = pd.to_datetime(out["warc_ts"], utc=True) \
                .dt.tz_localize(None)
            yield out

    df = base.mapInPandas(gen, schema=PAGES_SCHEMA)
    if with_fixtures:
        import pandas as pd
        fx = pd.DataFrame(fixture_rows(),
                          columns=["url", "warc_ts", "html", "text", "lang"])
        fx["warc_ts"] = pd.to_datetime(fx["warc_ts"], utc=True).dt.tz_localize(None)
        df = df.unionByName(spark.createDataFrame(fx, schema=PAGES_SCHEMA))
    return df
