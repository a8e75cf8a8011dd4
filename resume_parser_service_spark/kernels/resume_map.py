"""Deterministic resume text -> structured resume mapping.

Replaces the reference's LLM "combine" step
(/root/reference/app/services/resume_parser.py:243-296) with a
rule-based section segmenter + field mapper. The output schema mirrors
/root/reference/app/schemas/resume.py:6-141 (field names/order as the
prompt schema /root/reference/app/services/prompt.py:44-155), and the
prompt's routing rules are implemented verbatim
(/root/reference/app/services/prompt.py:16-20,178-182):
diplomas/degrees -> education_details, scholarships/awards ->
achievements, workshops/seminars -> projects.

``resume_to_text`` reproduces the flattening semantics of
``ResumeBase.to_text`` (/root/reference/app/schemas/resume.py:143-292)
— section order, line formats, and separators — because it defines the
embedding input and is a golden-text artifact.

All values stay strings (dates included) — byte-identity requirement
(SURVEY.md §1.2).
"""

from __future__ import annotations

import re

__all__ = ["map_resume", "resume_to_text", "empty_resume", "KERNEL_VERSION"]

KERNEL_VERSION = "map-1.6.0"

_SECTION_HEADERS = {
    "education": "education",
    "education and training": "education",
    "academic studies": "education",
    "ongoing studies": "education",
    "experience": "experience",
    "work experience": "experience",
    "work experiences": "experience",
    "employment": "experience",
    "projects": "projects",
    "achievements": "achievements",
    "awards": "achievements",
    "certifications": "certifications",
    "certificates": "certifications",
    "languages": "languages",
    "language skills": "languages",
    "interests": "interests",
    "skills": "skills",
    "summary": "summary",
}

# keyword fallback for header-shaped lines (ALL-CAPS, <=5 words) that
# don't match an exact alias — order encodes routing priority (e.g.
# "FOREIGN LANGUAGE SKILLS" is languages, not skills)
_HEADER_KEYWORDS = [
    ("languag", "languages"),
    ("certificat", "certifications"),
    ("award", "achievements"),
    ("accolade", "achievements"),
    ("achievement", "achievements"),
    ("project", "projects"),
    ("interest", "interests"),
    ("hobbies", "interests"),
    ("education", "education"),
    ("studies", "education"),
    ("training", "education"),
    ("experience", "experience"),
    ("employment", "experience"),
    ("skill", "skills"),
    ("competenc", "skills"),
    ("summary", "summary"),
    ("profile", "summary"),
]


def _header_kind(line: str) -> str | None:
    s = line.strip().rstrip(":").strip()
    if not s:
        return None
    kind = _SECTION_HEADERS.get(s.lower())
    if kind:
        return kind
    if s.isupper() and len(s.split()) <= 5:
        low = s.lower()
        for kw, k in _HEADER_KEYWORDS:
            if kw in low:
                return k
    return None

_EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
_PHONE_RE = re.compile(r"(\+\d{1,3})?[ .]?(\(?\d{2,4}\)?[ .-]?\d{3}[ .-]?\d{3,6})")
_URL_RE = re.compile(r"https?://[^\s)>\]]+")
_YEAR_RANGE_RE = re.compile(r"^(\d{4})\s*[-–—]\s*(\d{4}|Present|present|Ongoing)$")
_DATE_TOK = (r"(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]* \d{4}"
             r"|\d{2}/\d{4}|\d{4}")
_PERIOD_RE = re.compile(
    rf"^({_DATE_TOK})\s*[-–—]\s*({_DATE_TOK}|Present|present)$")
# inline form: the period is embedded in a header line ("Co-Founder &
# Software Engineer 01/2022 – Present")
_PERIOD_INLINE_RE = re.compile(
    rf"({_DATE_TOK})\s*(?:[-–—]|to)\s*({_DATE_TOK}|Present|present|Ongoing)")
_BULLET_RE = re.compile(r"^[●•▪‣\uf0b7]\s*")
# leading CEFR/fluency token of a proficiency value
_LEVEL_RE = re.compile(
    r"^(?:A1|A2|B1|B2|C1|C2|Native|Fluent|Basic|Beginner|Intermediate|"
    r"Advanced|Professional|Conversational|Mother\s?tongue)\b", re.I)
_LOCATION_RE = re.compile(r"^([A-Z][A-Za-z .'-]+),\s*([A-Z][A-Za-z .'-]+)$")
# plausible language names for the Europass-panel detector (lowercase)
_LANG_NAMES = frozenset(
    "english italian french german spanish portuguese dutch russian "
    "chinese japanese arabic hindi polish romanian greek swedish "
    "norwegian danish finnish turkish czech slovak hungarian ukrainian "
    "korean".split())


def empty_resume() -> dict:
    """All-null resume dict in canonical field order."""
    return {
        "personal_information": None,
        "education_details": None,
        "experience_details": None,
        "projects": None,
        "achievements": None,
        "certifications": None,
        "languages": None,
        "interests": None,
        "availability": None,
        "salary_expectations": None,
        "self_identification": None,
        "legal_authorization": None,
        "work_preferences": None,
    }


def _split_sections(text: str) -> list[tuple[str, list[str]]]:
    """Split text into (section_kind, lines) in document order; leading
    unlabeled lines form the ("head", ...) section."""
    sections: list[tuple[str, list[str]]] = [("head", [])]
    for line in text.split("\n"):
        s = line.strip()
        key = _header_kind(line)
        if key and (s.isupper() or s.istitle()
                    or s.rstrip(":").isupper()):
            sections.append((key, []))
        else:
            sections[-1][1].append(line)
    return sections


def _groups(lines: list[str]) -> list[list[str]]:
    """Blank-line-separated groups of stripped, non-empty lines."""
    out: list[list[str]] = []
    cur: list[str] = []
    for ln in lines:
        s = ln.strip()
        if not s:
            if cur:
                out.append(cur)
                cur = []
        else:
            cur.append(s)
    if cur:
        out.append(cur)
    return out


# words that look name-shaped but never are (document furniture)
_NAME_STOP = {"summary", "curriculum", "vitae", "resume", "cv", "contact",
              "profile", "objective", "about", "portfolio", "experienced",
              "senior", "junior"}

_NAME_TOK_RE = re.compile(r"[A-Z][A-Za-z.'-]*$")

# labeled phone: value may sit on the next line (narrow-column layouts);
# \xa0 appears inside numbers in real PDFs (non-breaking space glyphs)
_PHONE_LABELED_RE = re.compile(
    r"\b(?:Phone|Tel|Telephone|Mobile|Cell|P)\s*:[ \t]*\n?[ \t]*"
    r"(\+\d{1,3})?[ .\xa0]?([\d(][\d\xa0 ().-]{5,})")
# bare phone: a line that is nothing but a phone number, possibly led
# by an icon-font glyph (private-use chars are not \w)
_PHONE_LINE_RE = re.compile(
    r"^[^\w\n+]*(\+\d{1,3})?[ .\xa0]?([\d(][\d\xa0 ().-]{6,})\s*$", re.M)
# inline international number (+CC ...) — two-column layouts interleave
# the contact sidebar with body prose, so no line anchor is possible
_PHONE_INLINE_RE = re.compile(
    r"(\+\d{1,3})[ \xa0]?([\d(][\d\xa0 ().-]*\d)")
# lenient email fallback: column-split layouts truncate the TLD
# mid-word ("...@gmail.c and optimize"); prefer the strict match
_EMAIL_LENIENT_RE = re.compile(
    r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+\.[A-Za-z]+")


def _rejoin_wrapped_tld(body: str, m: "re.Match") -> str:
    """Narrow-column layouts wrap an email's TLD onto the next line
    ("…@gmail.co" / "m", or mid-line "…@gmail.c and …" / "om"). When
    the first non-empty line after the matched line is a 1-3 char
    lowercase fragment that completes a plausible TLD, append it."""
    email = m.group(0)
    nl = body.find("\n", m.end())
    if nl < 0:
        return email
    nxt = body[nl + 1:nl + 8].split("\n", 1)[0].strip()
    tld = email.rsplit(".", 1)[-1]
    if (re.fullmatch(r"[a-z]{1,3}", nxt) and (tld + nxt).isalpha()
            and len(tld + nxt) <= 6 and tld.islower()):
        return email + nxt
    return email


def _name_tokens(line: str) -> list[str]:
    """Leading name-shaped tokens of a line (stops at furniture words,
    digits, or prose) — handles two-column interleave where the name
    column and body column share a text line."""
    toks = []
    for t in line.split():
        if (_NAME_TOK_RE.match(t) and t.lower().rstrip(".'-") not in
                _NAME_STOP and len(t) >= 2):
            toks.append(t)
        else:
            break
    return toks


def _valid_phone(num: str, lo: int = 7, hi: int = 15) -> bool:
    digits = re.sub(r"\D", "", num)
    return lo <= len(digits) <= hi and "/" not in num


def _find_phone(text: str) -> tuple[str | None, str | None]:
    """Labeled number first, then a standalone phone line, then an
    inline +CC-prefixed number (interleaved two-column layouts)."""
    m = _PHONE_LABELED_RE.search(text)
    if m and _valid_phone(m.group(2), lo=6):
        return m.group(1), m.group(2).strip()
    for m2 in _PHONE_LINE_RE.finditer(text):
        if _valid_phone(m2.group(2)):
            return m2.group(1), m2.group(2).strip()
    for m3 in _PHONE_INLINE_RE.finditer(text):
        if _valid_phone(m3.group(2)):
            return m3.group(1), m3.group(2).strip()
    return None, None


# city -> country: the deterministic subset of the reference LLM's
# country inference (it fills `country` from an Italian address; a
# static major-city table is public knowledge and reproducible)
_CITY_COUNTRY = {c: "Italy" for c in (
    "GENOVA", "GENOA", "TORINO", "TURIN", "MILANO", "MILAN", "ROMA",
    "ROME", "NAPOLI", "NAPLES", "FIRENZE", "FLORENCE", "BOLOGNA",
    "VENEZIA", "VENICE", "PALERMO", "TRIESTE", "PADOVA", "VERONA",
    "PISA", "SAVONA", "BERGAMO", "BARI", "CATANIA")}

_COUNTRY_DIAL = {
    "Italy": "+39", "UK": "+44", "United Kingdom": "+44", "England": "+44",
    "Ireland": "+353", "France": "+33", "Germany": "+49", "Spain": "+34",
    "Portugal": "+351", "Netherlands": "+31", "Switzerland": "+41",
    "Austria": "+43", "Belgium": "+32", "USA": "+1", "Canada": "+1",
}

_SIDEBAR_LABEL_RE = re.compile(
    r"^(Phone|Tel|Telephone|Mobile|Cell|Email|E-mail|Contact|Links?"
    r"|Website)\b", re.I)


def _left_column_fragment(line: str) -> str:
    """Leading sidebar-column text of a two-column interleaved line: a
    2+-space run or an interleaved bullet glyph is a column gap;
    otherwise the fragment ends before the first lowercase-initial
    token ('177 Great Portland Street, workflow.' -> '177 Great
    Portland Street,')."""
    frag = re.split(r"\s{2,}|\s*[●•▪‣\uf0b7]\s*", line.strip())[0]
    out: list[str] = []
    for t in frag.split():
        if out and t[:1].islower():
            break
        out.append(t)
    return " ".join(out)


def _labeled_sidebar_address(stripped: list[str]) -> str | None:
    """'Address:' sidebar label whose value wraps over the following
    lines, each possibly interleaved with the body column. Fragments
    are joined while they end with a comma (wrapped continuation);
    collection stops at the next sidebar label."""
    for i, l in enumerate(stripped):
        if not re.match(r"^Address\s*:", l, re.I):
            continue
        first = _left_column_fragment(l)
        parts = []
        inline = re.sub(r"^Address\s*:\s*", "", first, flags=re.I).strip()
        if inline:
            parts.append(inline)
        for j in range(i + 1, min(i + 5, len(stripped))):
            if parts and not parts[-1].endswith(","):
                break
            frag = _left_column_fragment(stripped[j])
            if not frag or _SIDEBAR_LABEL_RE.match(frag):
                break
            parts.append(frag)
        if parts:
            return re.sub(r"\s*,\s*", ", ", " ".join(parts)).strip(" ,")
    return None


_SIDEBAR_LABEL_LINE_RE = re.compile(
    r"^(?:Address|Phone|Tel|Telephone|Mobile|Email|E-mail|Website"
    r"|Links?|Contact)\s*:?\s*$", re.I)
_MIDLINE_BULLET_RE = re.compile(r"(?<=\S)\s+[●•▪‣\uf0b7]\s*")
_POSTCODE_RE = re.compile(r"\b[A-Z]{1,2}\d[A-Z\d]?\s+\d[A-Z]{2}\b")


def _sidebar_fragment_like(frag: str) -> bool:
    """Does this left-column fragment read as CONTACT-sidebar content
    (label, phone/email fragment, street line, postcode) rather than
    body prose? The patterns are deliberately narrow — body text must
    never be stripped on a false positive."""
    if not frag:
        return False
    if _SIDEBAR_LABEL_LINE_RE.match(frag):
        return True
    if "@" in frag:
        return True
    if re.fullmatch(r"\d{4}\s*/\s*\d{4}", frag):
        return False  # a year pair ("2020/2021") is body, not a phone
    if (re.fullmatch(r"\+?[\d(][\d ()./\xa0-]{4,}", frag)
            and sum(c.isdigit() for c in frag) >= 6):
        return True
    if _POSTCODE_RE.search(frag):
        return True
    # street fragment: house number + capitalized words, wrapped with
    # a trailing comma ("177 Great Portland Street,")
    if re.fullmatch(r"\d+\s+[A-Z][A-Za-z .'-]*,", frag):
        return True
    return False


def _unweave_sidebar(lines: list[str]) -> list[str]:
    """Remove Contact-sidebar fragments interleaved into a body column
    (two-column PDFs linearize 'Address: ● Develop project concepts'
    onto one line). Deterministic twin of the reference merge-prompt's
    column-disentangling rules
    (/root/reference/app/services/prompt.py:162-301): a mid-line
    bullet glyph after sidebar-shaped text starts a NEW bullet; a
    sidebar-shaped left fragment is dropped from a continuation line;
    a 1-3 letter lowercase orphan right after an email fragment is the
    wrapped TLD. Contact values themselves are harvested by _personal
    over the full text, so nothing is lost."""
    out: list[str] = []
    prev_email = False
    in_sidebar = False  # a sidebar LABEL must appear before any
    #                     non-label fragment is ever stripped — a
    #                     one-column resume's '5 Star Hotel,' or
    #                     '2020/2021 season' lines are body text
    for ln in lines:
        s = ln.strip()
        if not s:
            out.append(ln)
            continue
        if _PERIOD_INLINE_RE.search(s):  # period headers never unweave
            prev_email = False
            out.append(ln)
            continue
        if _SIDEBAR_LABEL_LINE_RE.match(s):
            prev_email = False
            in_sidebar = True
            continue
        m = _MIDLINE_BULLET_RE.search(s)
        if m:
            left = s[:m.start()].strip()
            if _SIDEBAR_LABEL_LINE_RE.match(left) or \
                    (in_sidebar and _sidebar_fragment_like(left)):
                prev_email = "@" in left
                in_sidebar = True
                out.append("• " + s[m.end():])
                continue
        if in_sidebar and not _BULLET_RE.match(s):
            frag = _left_column_fragment(s)
            if (frag and s.startswith(frag)
                    and _sidebar_fragment_like(frag)):
                rest = s[len(frag):].strip()
                prev_email = "@" in frag
                if rest:
                    out.append(rest)
                continue
            if prev_email and re.fullmatch(r"[a-z]{1,3}", s):
                prev_email = False
                continue
        prev_email = False
        out.append(ln)
    return out


def _personal(lines: list[str], links: list[str],
              full_text: str = "") -> dict | None:
    """Personal-information mapper. Name/surname come from the leading
    head lines; contact fields (email/phone/urls/DOB) are searched over
    the WHOLE document — real resumes put them in sidebars and Contact
    sections that land mid-text after layout linearization."""
    pi = {"name": None, "surname": None, "date_of_birth": None,
          "country": None, "city": None, "address": None, "zip_code": None,
          "phone_prefix": None, "phone": None, "email": None,
          "github": None, "linkedin": None}
    body = full_text or "\n".join(lines)
    stripped = [l.strip() for l in lines if l.strip()]
    if stripped:
        first = stripped[0]
        if "@" not in first and not _URL_RE.search(first):
            toks = _name_tokens(first)
            if toks:
                pi["name"] = toks[0]
                if len(toks) > 1:
                    pi["surname"] = " ".join(toks[1:])
                elif len(stripped) > 1:
                    # single-token first line: surname often wraps to the
                    # next line (LORENZO / FOSCHI). Reject lines carrying
                    # addresses or contact info (digits, commas, @, |).
                    nxt = stripped[1]
                    if not re.search(r"[\d,@|]", nxt):
                        toks2 = _name_tokens(nxt)
                        if toks2 and (toks2[0].isupper() == toks[0].isupper()):
                            pi["surname"] = toks2[0]
    for l in stripped[1:]:
        m = _LOCATION_RE.match(re.sub(r"\s*(Email|Phone|E-mail):.*", "", l))
        if m and pi["city"] is None:
            pi["city"], pi["country"] = m.group(1), m.group(2)
    # pipe-delimited contact header: "Dublin 1, Ireland | P: +353 ... | ..."
    if pi["city"] is None:
        for l in stripped[:4]:
            f = l.split("|")[0].strip()
            m = re.match(r"^([A-Z][A-Za-z .'-]*?)(\s+\d+)?,\s*"
                         r"([A-Z][A-Za-z .'-]+)$", f)
            if m:
                pi["city"], pi["country"] = m.group(1), m.group(3)
                if m.group(2):
                    pi["address"] = f.split(",")[0].strip()
                break
    # zip/postal code: a 5-digit (or ZIP+4) group on an address-shaped
    # head line (has letters and a comma) — "Via di Creto 61, 16165
    # GENOVA (GE)" -> 16165; phone/date lines don't qualify
    for l in stripped:
        if pi["zip_code"]:
            break
        if "," in l and re.search(r"[A-Za-z]", l) and "@" not in l:
            zm = re.search(r"\b(\d{5}(?:-\d{4})?)\b", l)
            if zm:
                pi["zip_code"] = zm.group(1)
                street = (l[:zm.start()].rstrip(" ,")
                          if "," in l[:zm.start()] else None)
                # European address shape: city follows the postal code
                # ("Via di Creto 61, 16165 GENOVA (GE)" -> GENOVA)
                cm = re.match(r"\s*([A-ZÀ-Ý][A-Za-zÀ-ÿ .'-]*?)"
                              r"(?:\s*\([A-Z]{2}\))?\s*$",
                              l[zm.end():])
                tail_city = cm.group(1).strip() if cm else ""
                if pi["city"] is None and tail_city:
                    pi["city"] = tail_city
                if pi["address"] is None and street:
                    # reference shape: the address keeps the full
                    # "street, zip CITY" render, province tag dropped
                    pi["address"] = (f"{street}, {zm.group(1)} {tail_city}"
                                     if tail_city else street)
    if pi["address"] is None:
        # the Address label lives in a Contact sidebar that lands
        # mid-text after two-column linearization — scan the whole
        # document, like the other contact fields
        addr = _labeled_sidebar_address(
            [bl.strip() for bl in body.split("\n") if bl.strip()])
        if addr:
            pi["address"] = addr
            # UK-style postcode embedded in the address ("London W5W
            # 6PQ"): split out the zip and the city word(s) before it
            pm = re.search(r"\b([A-Z]{1,2}\d[A-Z\d]?\s+\d[A-Z]{2})\s*$",
                           addr)
            if pm:
                if pi["zip_code"] is None:
                    pi["zip_code"] = pm.group(1)
                if pi["city"] is None:
                    cm = re.search(r"([A-Z][A-Za-z'-]+)\s*$",
                                   addr[:pm.start()].rstrip(" ,"))
                    if cm:
                        pi["city"] = cm.group(1)
    m = _EMAIL_RE.search(body) or _EMAIL_LENIENT_RE.search(body)
    if m:
        pi["email"] = _rejoin_wrapped_tld(body, m)
    pi["phone_prefix"], pi["phone"] = _find_phone(body)
    if pi["phone"]:
        # "(0)20 ..." is international trunk NOTATION, not content —
        # the parenthesized zero is dialed domestically, so render it
        # as the plain leading zero the reference output uses
        pi["phone"] = re.sub(r"^\(0\)\s*", "0", pi["phone"])
    dm = re.search(r"(?:Date of [Bb]irth|DOB)\s*[:/]?\s*"
                   r"([0-9][0-9/.-]{5,9})", body)
    if dm:
        pi["date_of_birth"] = dm.group(1)
    if pi["country"] is None:
        # stated nationality ("Nationality/ citizenship/Italy") — a
        # column-interleaved Europass label, value ends at the first
        # non-capitalized token
        nm = re.search(r"(?:Nationality|Citizenship)[^\n]*?/\s*"
                       r"([A-Z][a-zà-ÿ]+)", body)
        if nm:
            pi["country"] = nm.group(1)
    if pi["country"] is None and pi["city"]:
        pi["country"] = _CITY_COUNTRY.get(pi["city"].upper())
    if pi["phone_prefix"] is None and pi["phone"] and pi["country"]:
        # country stated but the number written without its dial code:
        # static country->E.164 prefix lookup
        pi["phone_prefix"] = _COUNTRY_DIAL.get(pi["country"])
    for url in links + _URL_RE.findall(body):
        if (("github.com" in url or ".github.io" in url)
                and pi["github"] is None):
            pi["github"] = url.rstrip("/")
        elif "linkedin.com" in url and pi["linkedin"] is None:
            pi["linkedin"] = url
    if pi["linkedin"] is None:
        # narrow sidebars wrap profile URLs mid-path ("linkedin.com/" /
        # "christopher.morgan"): join a path-less match with a
        # single-token following line
        wm = re.search(r"(?:www\.)?linkedin\.com/\s*\n([A-Za-z0-9._-]"
                       r"{2,40})\s*$", body, re.M)
        if wm:
            pi["linkedin"] = "linkedin.com/" + wm.group(1)
    if all(v is None for v in pi.values()):
        return None
    return pi


_DEGREE_RE = re.compile(
    r"\b(Bachelor|Master|PhD|Ph\.D|Doctorate|Diploma|MBA|BSc|MSc|B\.S|M\.S"
    r"|Degree|Laurea)\b", re.I)

# a COMPLETE degree phrase (for labels like "Bachelor of Science: X");
# "Master thesis" must not qualify just because it starts with Master.
# Case-insensitive and covering the same token set as _DEGREE_RE
# (B.S/M.S/Laurea included) so no previously-parsed label regresses.
_DEGREE_LABEL_RE = re.compile(
    r"(?:Bachelor|Master)(?:'s)?(?:\s+of\s+[A-Za-z][A-Za-z ]{2,30})?"
    r"(?:\s+Degree)?|PhD|Ph\.D\.?|MBA|BSc|MSc|B\.S\.?|M\.S\.?"
    r"|Doctorate|Diploma|High School Diploma"
    r"|Laurea(?:\s+[A-Za-z ]{2,30})?", re.I)

_TRAIL_LOC_RE = re.compile(
    r"^(.*?)\s+([A-Z][A-Za-z.'-]+,\s*[A-Z][A-Za-z .'-]+)$")


_COUNTRIES = {
    "Italy", "Ireland", "France", "Germany", "Spain", "Portugal",
    "Netherlands", "Belgium", "Switzerland", "Austria", "Poland",
    "Sweden", "Norway", "Denmark", "Finland", "Greece", "England",
    "Scotland", "Wales", "UK", "USA", "Canada", "Mexico", "Brazil",
    "Argentina", "Chile", "India", "China", "Japan", "Korea",
    "Australia", "Singapore", "Israel", "Turkey", "Egypt", "Nigeria",
    "Kenya", "Morocco", "Romania", "Hungary", "Czechia", "Slovakia",
    "Croatia", "Serbia", "Bulgaria", "Ukraine", "Estonia", "Latvia",
    "Lithuania", "Iceland", "Luxembourg", "Malta", "Cyprus",
}


def _strip_trailing_location(line: str) -> tuple[str, str | None]:
    """Two-column headers render as '<name> <City, Country>' on one
    line; split them ('University of Genoa Genoa, Italy'). A single
    trailing word counts as a location only when it is a known country
    name ('BlockChain Rush Italy' — but never 'Trinity College')."""
    m = _TRAIL_LOC_RE.match(line)
    if m and not re.match(r"^(?:University|College|Institute|School"
                          r"|Politecnico|Academy)\b", m.group(2)):
        return m.group(1), m.group(2)
    # "Columbia University, NY": the name itself contains the comma
    # pair — trailing single-word state/city, not a "<name> <City,
    # Country>" render (map-1.5.0). The single word must LOOK like a
    # place (country name or an all-caps state abbrev): a comma-bearing
    # org name with a one-word tail ("Ernst, Young") keeps its tail.
    m = _LOCATION_RE.match(line)
    if m and len(m.group(2).split()) == 1 and (
            m.group(2) in _COUNTRIES
            or re.fullmatch(r"[A-Z]{2,3}", m.group(2))):
        return m.group(1), m.group(2)
    m = re.match(r"^(.*\S)\s+([A-Z][a-zA-Z]{2,})$", line)
    if m and m.group(2) in _COUNTRIES:
        return m.group(1), m.group(2)
    return line, None


def _education_group(g: list[str]) -> dict:
    edu = {"education_level": None, "institution": None,
           "field_of_study": None, "final_evaluation_grade": None,
           "start_date": None, "year_of_completion": None, "exam": None}
    exam: dict[str, str] = {}
    rest: list[str] = []
    for ln in g:
        m = _YEAR_RANGE_RE.match(ln)
        if m:
            edu["start_date"] = m.group(1)
            edu["year_of_completion"] = m.group(2)
            continue
        # exam bullets: "● Course Name -> GPA: 4"
        bm = re.match(r"^[●•▪‣-]\s*(.+?)\s*-+>\s*(.+)$", ln)
        if bm:
            exam[bm.group(1)] = bm.group(2)
            continue
        # pipe header: "Bachelor's Degree | Computer Science | GPA: 4/4 2020 – 2023"
        if "|" in ln and _DEGREE_RE.search(ln.split("|")[0]):
            fields = [f.strip() for f in ln.split("|")]
            edu["education_level"] = fields[0]
            if len(fields) > 1:
                edu["field_of_study"] = fields[1]
            tail = " ".join(fields[2:])
            pm = _PERIOD_INLINE_RE.search(tail)
            if pm:
                edu["start_date"] = pm.group(1)
                edu["year_of_completion"] = pm.group(2)
                tail = (tail[:pm.start()] + tail[pm.end():]).strip()
            if tail:
                edu["final_evaluation_grade"] = tail
            continue
        gm = re.match(r"^(?:Grade|GPA|Final grade)\s*:\s*(.+)$", ln, re.I)
        if gm:
            edu["final_evaluation_grade"] = gm.group(1)
            continue
        em = re.match(r"^Exam\s+(.+?)\s*:\s*(.+)$", ln)
        if em:
            exam[em.group(1)] = em.group(2)
            continue
        # "Bachelor of Science: Computer Information Systems -" (colon
        # degree/field form; trailing dash is a wrapped column artifact)
        dm = re.match(r"^(.+?)\s*:\s*(.+?)[\s\-–—]*$", ln)
        if dm and edu["education_level"] is None \
                and _DEGREE_LABEL_RE.fullmatch(dm.group(1)):
            # the label must BE a degree phrase ("Bachelor of Science:
            # X"), not merely start with a degree word ("Master
            # thesis: X") or mention one ("Expected degree mark:
            # 110/110" — a Europass form label)
            edu["education_level"] = dm.group(1)
            edu["field_of_study"] = dm.group(2)
            continue
        # bare graduation year on its own (column-wrapped) line
        if re.fullmatch(r"(?:19|20)\d{2}", ln) \
                and edu["year_of_completion"] is None:
            edu["year_of_completion"] = ln
            continue
        # ALL-CAPS degree prefix glued to the institution by two-column
        # linearization ("MASTER'S DEGREE Università degli Studi ...").
        # Case-SENSITIVE caps: a case-insensitive match here shadowed
        # the "Master's Degree in X" rule below and corrupted normal
        # degree lines (r3 review finding)
        gm2 = re.match(r"^((?:MASTER|BACHELOR)'?S\s+DEGREE)\s+(.{4,})$",
                       ln)
        if gm2 and edu["education_level"] is None:
            edu["education_level"] = gm2.group(1)
            rest.append(gm2.group(2))
            continue
        im = re.match(r"^(.+?)\s+in\s+(.+)$", ln)
        if im and edu["education_level"] is None and im.group(1) in (
                "Bachelor", "Master", "PhD", "Bachelor's Degree",
                "Master's Degree", "Diploma", "Doctorate", "MBA", "BSc",
                "MSc", "High School Diploma"):
            edu["education_level"] = im.group(1)
            edu["field_of_study"] = im.group(2)
            continue
        rest.append(ln)
    if rest and edu["institution"] is None:
        edu["institution"] = _strip_trailing_location(rest[0])[0]
    if exam:
        edu["exam"] = exam
    return edu


def _looks_like_entry_header(ln: str) -> bool:
    """Company/position headers must not read like a sentence
    fragment — a wrapped bullet continuation ('issues immediately.')
    starts with a lowercase WORD or is a trailing-period sentence, and
    must never open an entry (reference merge-rule parity:
    /root/reference/app/services/prompt.py entry-separation rules).
    Camel-case brands ('eBay', 'iQuest') and short dotted names
    ('Acme Inc.') still qualify."""
    s = ln.strip()
    if not s:
        return False
    if s[0].islower() and not (len(s) > 1 and s[1].isupper()):
        return False
    if s.endswith(".") and len(s.split()) >= 4:
        return False  # sentence-like, not a short dotted org name
    return True


def _split_period_entries(g: list[str]) -> list[list[str]]:
    """Split one blank-line group holding several employers (dense
    layouts have no blank lines between entries): a new entry starts at
    a header-shaped non-bullet line whose NEXT line carries an inline
    period and is itself period-free ('BlockChain Rush Italy' /
    'Co-Founder ... 01/2022 – Present'), or at a header-shaped line
    carrying its OWN inline period when the running entry already has
    one ('Waitress - 09/2015 to 05/2017' after a completed entry)."""
    entries: list[list[str]] = []
    cur: list[str] = []
    for i, ln in enumerate(g):
        nxt = g[i + 1] if i + 1 < len(g) else ""
        is_header = (cur
                     and not _BULLET_RE.match(ln)
                     and not _PERIOD_INLINE_RE.search(ln)
                     and _looks_like_entry_header(ln)
                     and not _BULLET_RE.match(nxt)
                     and _PERIOD_INLINE_RE.search(nxt) is not None)
        new_period_entry = (len(cur) > 1
                            and not _BULLET_RE.match(ln)
                            and _looks_like_entry_header(ln)
                            and _PERIOD_INLINE_RE.search(ln) is not None
                            and any(_PERIOD_INLINE_RE.search(c)
                                    for c in cur))
        if is_header or new_period_entry:
            entries.append(cur)
            cur = [ln]
        else:
            cur.append(ln)
    if cur:
        entries.append(cur)
    return entries


def _experience_group(g: list[str]) -> dict:
    exp = {"position": None, "company": None, "employment_period": None,
           "location": None, "industry": None,
           "key_responsibilities": None, "skills_acquired": None}
    resp: list[str] = []
    body = g
    # company-first header pair: line0 = "Company [Location]", line1 =
    # "Position <period>" (period embedded, position text non-empty)
    if len(g) >= 2 and not _BULLET_RE.match(g[0]) \
            and not _PERIOD_INLINE_RE.search(g[0]) \
            and not _BULLET_RE.match(g[1]):
        pm = _PERIOD_INLINE_RE.search(g[1])
        pos_rest = (re.sub(r"[\s\-–—,|:]+$", "",
                           (g[1][:pm.start()] + g[1][pm.end():]).strip())
                    if pm else "")
        if pm and pos_rest:
            exp["company"], exp["location"] = _strip_trailing_location(g[0])
            exp["position"] = pos_rest
            exp["employment_period"] = pm.group(0)
            body = g[2:]
    if body is g:  # legacy position-first forms
        for i, ln in enumerate(g):
            if i == 0:
                pm = _PERIOD_INLINE_RE.search(ln)
                if pm:
                    # single-line header "Web Developer - 09/2015 to
                    # 05/2019" (map-1.5.0): the period is part of the
                    # header, not the position text
                    exp["employment_period"] = pm.group(0)
                    ln = (ln[:pm.start()] + ln[pm.end():]).strip()
                    ln = re.sub(r"[\s\-–—,|:]+$", "", ln)
                m = re.match(r"^(.+?)\s+at\s+(.+)$", ln)
                if m:
                    exp["position"], exp["company"] = m.group(1), m.group(2)
                else:
                    m2 = re.match(r"^(.+?)\s*[—|]\s*(.+)$", ln)
                    if m2:
                        exp["position"], exp["company"] = (m2.group(1),
                                                           m2.group(2))
                    elif ln:
                        # a bare-period header line leaves no position
                        # text — keep None, not ""
                        exp["position"] = ln
                body = g[1:]
                break
    for ln in body:
        if _PERIOD_RE.match(ln):
            exp["employment_period"] = ln
            continue
        sm = re.match(r"^Skills\s*:\s*(.+)$", ln, re.I)
        if sm:
            exp["skills_acquired"] = [s.strip() for s in sm.group(1).split(",")
                                      if s.strip()]
            continue
        im = re.match(r"^Industry\s*:\s*(.+)$", ln, re.I)
        if im:
            exp["industry"] = im.group(1)
            continue
        if ln.startswith("- ") or _BULLET_RE.match(ln):
            resp.append(_BULLET_RE.sub("", ln[2:] if ln.startswith("- ")
                                       else ln))
            continue
        lm = _LOCATION_RE.match(ln)
        if (lm and exp["company"] is None and exp["location"] is None
                and exp["employment_period"] is not None and not resp
                and len(lm.group(1).split()) >= 2):
            # "Luna Web Design, New York" right under a period-carrying
            # header is Company, City (map-1.5.0); a single-word head
            # stays a plain location ("Genoa, Italy"). When the period
            # line was BARE, the head may still glue position+company
            # ("Web Developer -  Luna Web Design, New York")
            head = lm.group(1)
            # the glue shows a COLUMN-GAP artifact: >= 2 spaces after
            # the dash ("Web Developer -  Luna Web Design"); a normal
            # dashed company name ("Merrill - Lynch Partners") has
            # single spaces and must stay whole
            parts = re.split(r"\s+[-–—]\s{2,}", head, maxsplit=1)
            if exp["position"] is None and len(parts) == 2:
                exp["position"], head = parts[0], parts[1]
            exp["company"], exp["location"] = head, lm.group(2)
            continue
        if lm and exp["location"] is None:
            exp["location"] = ln
            continue
        if resp:
            # wrapped continuation of the previous bullet
            resp[-1] = resp[-1] + " " + ln
    if resp:
        exp["key_responsibilities"] = resp
    return exp


def _project_group(g: list[str]) -> dict:
    proj = {"name": None, "description": None, "link": None}
    for i, ln in enumerate(g):
        lm = re.match(r"^Link\s*:\s*(\S+)$", ln, re.I)
        if lm:
            proj["link"] = lm.group(1)
            continue
        if i == 0:
            m = re.match(r"^(.+?)\s*:\s*(.+)$", ln)
            if m:
                proj["name"], proj["description"] = m.group(1), m.group(2)
            else:
                proj["name"] = ln
        elif proj["description"] is None:
            proj["description"] = ln
    return proj


def _named_desc_group(g: list[str]) -> dict:
    m = re.match(r"^(.+?)\s*:\s*(.+)$", g[0])
    if m:
        return {"name": m.group(1), "description": m.group(2)}
    return {"name": g[0],
            "description": " ".join(g[1:]) if len(g) > 1 else None}


# --- Europass experience reconstruction (map-1.5.0) -----------------
# Europass exports render experience as a two-column grid whose
# linearization interleaves position/company/sector/location/period
# (left) with activity prose (right) AND sidebar panels — the section
# parser sees soup. But the grid leaves exact anchors in the text:
# one "MM/YYYY - MM/YYYY" period line per entry, "Main activities and
# responsibilities:" glued to the position, "Company sector:" carrying
# the industry, an ALL-CAPS company line, and a "CITY (XX)" location.
_EU_PERIOD_RE = re.compile(
    r"^(\d{2}/\d{4})\s*[-–—‐]\s*(\d{2}/\d{4}|Present|present|Ongoing)")
_EU_LOC_RE = re.compile(r"^((?:[A-ZÀ-Þ]+\s+)?\([A-Z]{2}\))")
_EU_SECTOR_RE = re.compile(r"Company sector:\s*(.*)$")
_EU_CAPS_TOK = re.compile(r"^[A-ZÀ-Þ][A-ZÀ-Þ0-9.'&()-]*$")
_EU_MAIN = "Main activities and responsibilities:"


def _eu_company(lines: list[str], window: range) -> str | None:
    """Last line in the window that is (after stripping glued CEFR
    cells) entirely ALL-CAPS tokens — the company cell. Panel headers
    (FOREIGN LANGUAGE SKILLS...) are excluded via _header_kind, the
    location cell via its own pattern."""
    best = None
    for i in window:
        ln = lines[i]
        if not ln or ":" in ln or _EU_LOC_RE.match(ln) \
                or _header_kind(ln) is not None:
            continue
        toks = ln.split()
        while toks and re.fullmatch(r"[ABC][12]", toks[0]):
            toks = toks[1:]
        if toks and all(_EU_CAPS_TOK.match(t) for t in toks) \
                and len(" ".join(toks)) >= 4:
            best = " ".join(toks)
    return best


def _eu_industry(lines: list[str], a: int, window: range) -> str | None:
    """'Company sector:' value for the entry anchored at line ``a`` —
    first occurrence at/just after the anchor, else the last one in the
    entry's own window; the value may sit on the same line, wrap onto a
    short lowercase continuation, or land on the next clean line."""
    hit = None
    for i in range(a, min(a + 4, len(lines))):
        m = _EU_SECTOR_RE.search(lines[i])
        if m:
            hit = (i, m)
            break
    if hit is None:
        for i in window:
            m = _EU_SECTOR_RE.search(lines[i])
            if m:
                hit = (i, m)
    if hit is None:
        return None
    i, m = hit
    val = m.group(1).strip()
    if not val:
        # value on a following clean line (short, no colon, no panel)
        for j in range(i + 1, min(i + 3, len(lines))):
            nxt = lines[j].strip()
            if (nxt and ":" not in nxt and len(nxt) < 40
                    and "\xa0" not in nxt
                    and _header_kind(nxt) is None
                    and not _EU_PERIOD_RE.match(nxt)):
                return nxt
        return None
    nxt = lines[i + 1].strip() if i + 1 < len(lines) else ""
    # wrapped continuation: only when the same-line value itself ends
    # mid-phrase — a single word ("Information") or a trailing
    # conjunction/preposition ("Engineering and") — never on raw line
    # lengths, so a complete short value ("Information systems, EDP")
    # followed by an unrelated lowercase line is left alone
    cut_short = (" " not in val and not val.endswith((".", ","))) or \
        val.rsplit(" ", 1)[-1].lower() in ("and", "of", "or", "for",
                                           "in", "&")
    if nxt and nxt[0].islower() and len(nxt) <= 20 and cut_short:
        val = f"{val} {nxt}"
    return val


_EU_EDU_RE = re.compile(r"^((?:MASTER|BACHELOR)'S DEGREE)\s+(.{4,})$")
_EU_MARK_RE = re.compile(r"(?:Expected|Final) degree mark:\s*(.+)$")
_EU_YEARS_RE = re.compile(r"^(\d{4})\s*[-–—‐]\s*(\d{4}|Present|Ongoing)")
_EU_FIELD_CAPS = re.compile(r"^[A-ZÀ-Þ]{4,}$")
_EU_FIELD_DEG = re.compile(r"level degree in ([A-Z][^|]+?)\s*$")


def _europass_education(text: str) -> list[dict]:
    """Europass/AlmaLaurea academic grid: entries anchor on the
    "MASTER'S/BACHELOR'S DEGREE <institution>" cell; the year range,
    degree mark and field land on the following (interleaved) lines."""
    lines = [ln.strip() for ln in text.split("\n")]
    anchors = [i for i, ln in enumerate(lines) if _EU_EDU_RE.match(ln)]
    out = []
    for k, a in enumerate(anchors):
        end = anchors[k + 1] if k + 1 < len(anchors) \
            else min(a + 14, len(lines))
        m = _EU_EDU_RE.match(lines[a])
        edu = {"education_level": m.group(1), "institution": m.group(2),
               "field_of_study": None, "final_evaluation_grade": None,
               "start_date": None, "year_of_completion": None,
               "exam": None}
        field_fallback = None
        for i in range(a + 1, end):
            ln = lines[i]
            ym = _EU_YEARS_RE.match(ln)
            if ym and edu["start_date"] is None:
                edu["start_date"] = ym.group(1)
                edu["year_of_completion"] = ym.group(2)
                continue
            km = _EU_MARK_RE.search(ln)
            if km and edu["final_evaluation_grade"] is None:
                edu["final_evaluation_grade"] = km.group(1).strip()
                continue
            if _EU_FIELD_CAPS.match(ln) and _header_kind(ln) is None \
                    and edu["field_of_study"] is None:
                # standalone ALL-CAPS word: the CERTIFIED TITLE cell
                edu["field_of_study"] = ln
                continue
            fm = _EU_FIELD_DEG.search(ln)
            if fm and field_fallback is None:
                field_fallback = fm.group(1).strip()
        if edu["field_of_study"] is None:
            edu["field_of_study"] = field_fallback
        out.append(edu)
    return out


def _europass_experience(text: str) -> list[dict]:
    lines = [ln.strip() for ln in text.split("\n")]
    anchors = [i for i, ln in enumerate(lines) if _EU_PERIOD_RE.match(ln)]
    if len(anchors) < 2:
        return []
    entries = []
    prev = max(0, anchors[0] - 10) - 1
    for a in anchors:
        window = range(prev + 1, a)
        exp = {"position": None, "company": None,
               "employment_period": None, "location": None,
               "industry": None, "key_responsibilities": None,
               "skills_acquired": None}
        pm = _EU_PERIOD_RE.match(lines[a])
        exp["employment_period"] = re.sub("[‐–—]", "-", pm.group(0)).strip()
        for i in window:
            if _EU_MAIN in lines[i]:
                pos, _, rest = lines[i].partition(_EU_MAIN)
                if pos.strip():
                    exp["position"] = pos.strip()
                if rest.strip():
                    exp["key_responsibilities"] = [rest.strip()]
                break
        exp["company"] = _eu_company(lines, window)
        for i in window:
            lm = _EU_LOC_RE.match(lines[i])
            if lm:
                exp["location"] = lm.group(1).strip()
        exp["industry"] = _eu_industry(lines, a, window)
        entries.append(exp)
        prev = a
    return entries


def map_resume(text: str, links: list[str] | None = None) -> dict:
    """Map extracted plain text (+ hyperlink list) into the resume dict."""
    links = links or []
    out = empty_resume()
    if not text:
        return out
    education: list[dict] = []
    experience: list[dict] = []
    projects: list[dict] = []
    achievements: list[dict] = []
    certifications: list[dict] = []
    languages: list[dict] = []
    interests: list[str] = []
    education_seen = False
    lang_leftovers: list[str] = []  # non-language lines + trimmed
    # suffixes captured by an interleaved Languages panel (map-1.5.0)

    for kind, lines in _split_sections(text):
        if kind == "head":
            out["personal_information"] = _personal(lines, links, text)
        elif kind == "education":
            education_seen = True
            for g in _groups(lines):
                head = g[0].lower()
                # routing rules (prompt.py:16-20)
                if "scholarship" in head or "award" in head:
                    achievements.append(_named_desc_group(g))
                elif "workshop" in head or "seminar" in head:
                    projects.append(_project_group(g))
                else:
                    education.append(_education_group(g))
        elif kind == "experience":
            for g in _groups(_unweave_sidebar(lines)):
                for entry in _split_period_entries(g):
                    experience.append(_experience_group(entry))
        elif kind == "projects":
            for g in _groups(lines):
                projects.append(_project_group(g))
        elif kind == "achievements":
            for g in _groups(lines):
                achievements.append(_named_desc_group(g))
        elif kind == "certifications":
            for g in _groups(lines):
                certifications.append(_named_desc_group(g))
        elif kind == "languages":
            for g in _groups(lines):
                for ln in g:
                    m = (re.match(r"^(.+?)\s*[:—–-]\s*(.+)$", ln)
                         or re.match(r"^(.+?)\s*\((.+)\)$", ln))
                    if m:
                        lang, prof = m.group(1).strip(), m.group(2).strip()
                        # two-column interleave glues body prose onto the
                        # proficiency ("C2 2014", "A1 Columbia University,
                        # NY") — trim to the leading level token; keep an
                        # entry only when it is language-shaped (level
                        # token, or a clean single-word language name)
                        lm = _LEVEL_RE.match(prof)
                        if lm:
                            suffix = prof[lm.end():].strip(" ,;")
                            if suffix:
                                lang_leftovers.append(suffix)
                            prof = lm.group(0)
                        if lm or (len(lang.split()) == 1
                                  and not re.search(r"[\d()]", lang)):
                            languages.append({"language": lang,
                                              "proficiency": prof})
                        else:
                            lang_leftovers.append(ln)
                    elif re.fullmatch(r"[A-Z][a-z]{2,14}", ln):
                        languages.append({"language": ln,
                                          "proficiency": None})
                    else:
                        lang_leftovers.append(ln)
        elif kind == "interests":
            for g in _groups(lines):
                for ln in g:
                    if ln.startswith("- "):
                        interests.append(ln[2:])
                    else:
                        interests.extend(s.strip() for s in ln.split(",")
                                         if s.strip())
    # Europass language panel: under two-column linearization the panel
    # interleaves with body prose, so the section parser sees certificate
    # noise ("PET. Cambridge Assessment. 19/07/2018") instead of the
    # panel. The panel markers themselves survive linearization:
    # "MOTHER TONGUE(S): <lang>" and an ALL-CAPS language name whose
    # following lines carry the five repeated CEFR skill cells
    # ("C1 C1 C1 C1 C1"). When the mother-tongue marker is present the
    # panel is authoritative (matches the reference's own golden for
    # CVENG, cv_output/worse.json).
    # the name may render Title-case ("Italian") or ALL CAPS ("ITALIAN")
    # depending on the template — normalize to Title case
    mt = re.search(r"MOTHER\s+TONGUE\(?S?\)?\s*:?\s*([A-Za-z]{3,})", text)
    if mt:
        mt_name = mt.group(1)
        if mt_name.isupper() or mt_name.islower():
            mt_name = mt_name.title()
        panel = {mt_name: "Mother tongue"}
        for cap in re.finditer(r"\b([A-Z]{4,})\b", text):
            name = cap.group(1).title()
            if name.lower() not in _LANG_NAMES or name in panel:
                continue
            window = text[cap.end():cap.end() + 220]
            cm = re.search(r"\b([ABC][12])\b(?:\W+\1\b)+", window)
            if cm:
                panel[name] = cm.group(1)
        languages = [{"language": k, "proficiency": v}
                     for k, v in panel.items()]

    if not languages:
        # fallback: languages rendered as a skills-style bullet anywhere
        # ("● Languages (Italian - Native, English - Professional)") —
        # section headers like ADDITIONAL don't classify, so scan text
        lm = re.search(r"\bLanguages?\s*\(([^)]*)\)", text)
        if lm:
            for part in lm.group(1).split(","):
                pm = re.match(r"^(.+?)\s*[-–:]\s*(.+)$", part.strip())
                if pm:
                    languages.append({"language": pm.group(1).strip(),
                                      "proficiency": pm.group(2).strip()})

    if (text.count("Company sector:") >= 2 and _EU_MAIN in text):
        # Europass export: reconstruct experience from the grid anchors
        # (one period line per entry) instead of the interleaved soup
        # the section parser saw (map-1.5.0)
        eu = _europass_experience(text)
        if len(eu) > len(experience):
            experience = eu
    if "degree mark:" in text:
        # same export's academic grid ("Expected/Final degree mark" is
        # AlmaLaurea phrasing): anchored degree cells beat the soup
        eu_edu = _europass_education(text)
        if eu_edu:
            education = eu_edu

    if not education and education_seen and lang_leftovers:
        # two-column interleave swallowed the Education body into the
        # Languages panel (resume2 shape): the non-language lines and
        # the prose trimmed off proficiency cells, in document order,
        # ARE the education entry (map-1.5.0)
        entry = _education_group(lang_leftovers)
        if any(v for k, v in entry.items() if k != "exam"):
            education.append(entry)

    if education:
        out["education_details"] = education
    if experience:
        out["experience_details"] = experience
    if projects:
        out["projects"] = projects
    if achievements:
        out["achievements"] = achievements
    if certifications:
        out["certifications"] = certifications
    if languages:
        out["languages"] = languages
    if interests:
        out["interests"] = interests
    return out


# ------------------------------------------------------------- to_text ---

def _kv(parts: list[str], label: str, val) -> None:
    if val:
        parts.append(f"{label}: {val}")


def resume_to_text(r: dict) -> str:
    """Flatten a resume dict to text — same section order, line formats,
    and separators as ``ResumeBase.to_text``
    (/root/reference/app/schemas/resume.py:143-292)."""
    sections: list[str] = []

    pi = r.get("personal_information")
    if pi:
        parts: list[str] = []
        _kv(parts, "Name", pi.get("name"))
        _kv(parts, "Surname", pi.get("surname"))
        _kv(parts, "Country", pi.get("country"))
        _kv(parts, "City", pi.get("city"))
        if parts:
            sections.append("Personal Information:\n" + "\n".join(parts))

    if r.get("education_details"):
        subs = []
        for e in r["education_details"]:
            parts = []
            _kv(parts, "Level", e.get("education_level"))
            _kv(parts, "Institution", e.get("institution"))
            _kv(parts, "Field", e.get("field_of_study"))
            _kv(parts, "Grade", e.get("final_evaluation_grade"))
            _kv(parts, "Started", e.get("start_date"))
            _kv(parts, "Completed", e.get("year_of_completion"))
            if parts:
                subs.append("\n".join(parts))
        if subs:
            sections.append("Education:\n" + "\n\n".join(subs))

    if r.get("experience_details"):
        subs = []
        for e in r["experience_details"]:
            parts = []
            _kv(parts, "Position", e.get("position"))
            _kv(parts, "Company", e.get("company"))
            _kv(parts, "Period", e.get("employment_period"))
            _kv(parts, "Location", e.get("location"))
            _kv(parts, "Industry", e.get("industry"))
            if e.get("key_responsibilities"):
                parts.append("Key Responsibilities:\n- " +
                             "\n- ".join(e["key_responsibilities"]))
            if e.get("skills_acquired"):
                parts.append("Skills Acquired:\n- " +
                             "\n- ".join(e["skills_acquired"]))
            if parts:
                subs.append("\n".join(parts))
        if subs:
            sections.append("Experience:\n" + "\n\n".join(subs))

    if r.get("projects"):
        subs = []
        for p in r["projects"]:
            parts = []
            _kv(parts, "Name", p.get("name"))
            _kv(parts, "Description", p.get("description"))
            _kv(parts, "Link", p.get("link"))
            if parts:
                subs.append("\n".join(parts))
        if subs:
            sections.append("Projects:\n" + "\n\n".join(subs))

    for key, title in (("achievements", "Achievements"),
                       ("certifications", "Certifications")):
        if r.get(key):
            subs = []
            for a in r[key]:
                parts = []
                _kv(parts, "Name", a.get("name"))
                _kv(parts, "Description", a.get("description"))
                if parts:
                    subs.append("\n".join(parts))
            if subs:
                sections.append(f"{title}:\n" + "\n\n".join(subs))

    if r.get("languages"):
        parts = [f"{l.get('language')}: {l.get('proficiency')}"
                 for l in r["languages"]
                 if l.get("language") and l.get("proficiency")]
        if parts:
            sections.append("Languages:\n" + "\n".join(parts))

    if r.get("interests"):
        sections.append("Interests:\n- " + "\n- ".join(r["interests"]))

    wp = r.get("work_preferences")
    if wp:
        parts = []
        _kv(parts, "Remote Work", wp.get("remote_work"))
        _kv(parts, "In-Person Work", wp.get("in_person_work"))
        _kv(parts, "Open to Relocation", wp.get("open_to_relocation"))
        if parts:
            sections.append("Work Preferences:\n" + "\n".join(parts))

    la = r.get("legal_authorization")
    if la:
        parts = []
        _kv(parts, "US Work Authorization", la.get("us_work_authorization"))
        _kv(parts, "EU Work Authorization", la.get("eu_work_authorization"))
        _kv(parts, "UK Work Authorization", la.get("uk_work_authorization"))
        _kv(parts, "Canada Work Authorization",
            la.get("canada_work_authorization"))
        if parts:
            sections.append("Legal Authorization:\n" + "\n".join(parts))

    return "\n\n".join(sections)
