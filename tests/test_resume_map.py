"""Resume mapper + schema + to_text tests (no Spark except schema test).

Mirrors the reference's schema assertions
(/root/reference/app/tests/conftest.py:201-289 fixture) and the prompt
routing rules (/root/reference/app/services/prompt.py:16-20)."""

import json

from resume_parser_service_spark.kernels.embed import EMBED_DIM, embed_text
from resume_parser_service_spark.kernels.resume_map import (map_resume,
                                                            resume_to_text)
from resume_parser_service_spark.schema import (RESUME_SCHEMA,
                                                canonical_resume_json)

SAMPLE = """John Doe
Dublin, Ireland
Email: john.doe@example.com
Phone: +353 871 234 567

EDUCATION
Master in Computer Science
Trinity College
2012 - 2014
Grade: First

Merit Scholarship: awarded for excellence

Deep Learning Workshop: two-day intensive

EXPERIENCE
Engineer at Acme
Jan 2015 - Dec 2018
- built pipelines
- ran oncall
Skills: spark, python

PROJECTS
SideProj: a side project
Link: https://github.com/johndoe/sideproj

CERTIFICATIONS
CKA: certified kubernetes admin

LANGUAGES
English: Native
Italian: B1

INTERESTS
- chess
- running"""


def test_personal_information():
    r = map_resume(SAMPLE, ["https://github.com/johndoe",
                            "https://linkedin.com/in/johndoe"])
    pi = r["personal_information"]
    assert pi["name"] == "John"
    assert pi["surname"] == "Doe"
    assert pi["city"] == "Dublin"
    assert pi["country"] == "Ireland"
    assert pi["email"] == "john.doe@example.com"
    assert pi["phone_prefix"] == "+353"
    assert pi["github"] == "https://github.com/johndoe"
    assert pi["linkedin"] == "https://linkedin.com/in/johndoe"


def test_education_parsed():
    r = map_resume(SAMPLE, [])
    edu = r["education_details"]
    assert len(edu) == 1
    e = edu[0]
    assert e["education_level"] == "Master"
    assert e["field_of_study"] == "Computer Science"
    assert e["institution"] == "Trinity College"
    assert e["start_date"] == "2012"
    assert e["year_of_completion"] == "2014"
    assert e["final_evaluation_grade"] == "First"


def test_routing_rules():
    """Scholarships/awards -> achievements; workshops/seminars ->
    projects (/root/reference/app/services/prompt.py:16-20)."""
    r = map_resume(SAMPLE, [])
    ach_names = [a["name"] for a in r["achievements"]]
    assert "Merit Scholarship" in ach_names
    proj_names = [p["name"] for p in r["projects"]]
    assert "Deep Learning Workshop" in proj_names
    assert "SideProj" in proj_names
    edu_insts = [e.get("institution") for e in r["education_details"]]
    assert "Merit Scholarship" not in str(edu_insts)


def test_experience_parsed():
    r = map_resume(SAMPLE, [])
    exp = r["experience_details"][0]
    assert exp["position"] == "Engineer"
    assert exp["company"] == "Acme"
    assert exp["employment_period"] == "Jan 2015 - Dec 2018"
    assert exp["key_responsibilities"] == ["built pipelines", "ran oncall"]
    assert exp["skills_acquired"] == ["spark", "python"]


def test_languages_interests_certifications():
    r = map_resume(SAMPLE, [])
    assert {"language": "English", "proficiency": "Native"} in r["languages"]
    assert r["interests"] == ["chess", "running"]
    assert r["certifications"][0]["name"] == "CKA"


def test_to_text_format(valid_resume_data):
    """Exact line formats/separators of ResumeBase.to_text
    (/root/reference/app/schemas/resume.py:143-292)."""
    txt = resume_to_text(valid_resume_data)
    assert txt.startswith("Personal Information:\nName: Jane\nSurname: Doe\n"
                          "Country: Ireland\nCity: Dublin")
    assert "\n\nEducation:\nLevel: Master\n" in txt
    assert "Key Responsibilities:\n- built pipelines\n- ran oncall" in txt
    assert "Languages:\nEnglish: Native" in txt
    assert "Interests:\n- chess\n- running" in txt
    assert "Legal Authorization:\nUS Work Authorization: Yes" in txt
    # sections are joined with blank lines, no trailing whitespace
    assert not txt.endswith("\n")


def test_to_text_empty_sections_skipped():
    assert resume_to_text({"personal_information": None}) == ""
    assert resume_to_text({"languages": [{"language": "X",
                                          "proficiency": None}]}) == ""


def test_canonical_json_deterministic(valid_resume_data):
    a = canonical_resume_json(valid_resume_data)
    b = canonical_resume_json(json.loads(a))
    assert a == b
    assert "\n" not in a


def test_resume_schema_roundtrip(spark, valid_resume_data):
    """The conformant fixture must round-trip through RESUME_SCHEMA."""
    from pyspark.sql import functions as F
    j = canonical_resume_json(valid_resume_data)
    df = spark.createDataFrame([(j,)], "resume_json string") \
        .select(F.from_json("resume_json", RESUME_SCHEMA).alias("r"))
    row = df.select("r.*").collect()[0]
    assert row["personal_information"]["zip_code"] == "D01XY45"
    assert len(row["personal_information"]["zip_code"]) <= 10
    assert row["education_details"][0]["exam"]["Algorithms"] == "A"
    assert row["legal_authorization"]["requires_uk_sponsorship"] == "Yes"
    # no field of the canonical JSON is dropped by the schema
    back = json.loads(df.select(F.to_json("r").alias("j")).collect()[0]["j"])
    assert back["personal_information"]["email"] == "jane.doe@example.com"


def test_embed_deterministic():
    v1 = embed_text("spark extraction pipeline")
    v2 = embed_text("spark extraction pipeline")
    assert v1 == v2
    assert len(v1) == EMBED_DIM
    norm = sum(x * x for x in v1) ** 0.5
    assert abs(norm - 1.0) < 1e-5
    assert embed_text("") == [0.0] * EMBED_DIM


def test_reference_pdf_mapper_goldens():
    """Frozen end-to-end goldens: reference PDF -> kernel text -> mapper
    struct -> canonical JSON. Regenerate deliberately on kernel bumps."""
    import os
    from resume_parser_service_spark.kernels.pdf_text import extract_pdf
    golden_dir = os.path.join(os.path.dirname(__file__), "golden")
    for f in ["resume1.pdf", "resume2.pdf", "resume3.pdf",
              "FedericoElia.pdf", "CVENG.pdf"]:
        src = f"/root/reference/{f}"
        if not os.path.exists(src):
            import pytest
            pytest.skip("reference fixtures not present")
        r = extract_pdf(open(src, "rb").read())
        m = map_resume(r["text"], r["links"])
        golden = open(os.path.join(golden_dir, f + ".resume.json")).read()
        assert canonical_resume_json(m) == golden


def test_reference_golden_field_recall():
    """Semantic fidelity vs the REFERENCE's own expected outputs
    (/root/reference/cv_output/*.json — produced by its GPT-4o pipeline
    on the same fixture PDFs). Checks per-field recall of
    personal_information, not byte equality: our mapper is the
    deterministic replacement for the LLM combine step (SURVEY.md A7),
    so matching the fields the LLM found is the fidelity bar
    (VERDICT.md round-1 item 3)."""
    import os
    import re

    import pytest

    from resume_parser_service_spark.kernels.pdf_text import extract_pdf

    if not os.path.exists("/root/reference/cv_output/worse.json"):
        pytest.skip("reference goldens not present")

    def digits(s):
        return re.sub(r"\D", "", s or "")

    cases = {  # pdf fixture -> reference golden with matching casing
        "CVENG.pdf": "worse.json",
        "FedericoElia.pdf": "resume.json",
        "resume2.pdf": "both_resume2.json",
    }
    got = {}
    for pdf, golden in cases.items():
        r = extract_pdf(open(f"/root/reference/{pdf}", "rb").read())
        ours = map_resume(r["text"], r["links"])["personal_information"]
        ref = json.load(open(f"/root/reference/cv_output/{golden}"))[
            "personal_information"]
        got[pdf] = (ours, ref)

    # CVENG: all four core fields must match the reference output,
    # plus city derived from the European address line (r2 session 2)
    ours, ref = got["CVENG.pdf"]
    assert ours["name"] == ref["name"] == "LORENZO"
    assert ours["surname"] == ref["surname"] == "FOSCHI"
    assert ours["email"] == ref["email"]
    assert digits(ours["phone"]) == digits(ref["phone"])
    assert ours["city"] == ref["city"] == "GENOVA"

    # FedericoElia: all core fields incl. the name/surname split — the
    # header is a Type3 (Arial Black subset) font whose /FontMatrix is
    # 1/2048, so the inter-word gap only survives with FontMatrix-scaled
    # widths (pdf-1.5.0)
    ours, ref = got["FedericoElia.pdf"]
    assert ours["name"] == ref["name"] == "FEDERICO"
    assert ours["surname"] == ref["surname"] == "ELIA"
    assert ours["email"] == ref["email"]
    assert digits(ours["phone"]) == digits(ref["phone"])
    assert ours["phone_prefix"] == ref["phone_prefix"]

    # resume2: name/surname match; phone digits match modulo the (0)
    # trunk notation; the line-wrapped email ("…gmail.c" / "om") is
    # re-joined by the mapper's wrapped-TLD heuristic (r2 session 2)
    ours, ref = got["resume2.pdf"]
    assert ours["name"] == ref["name"]
    assert ours["surname"] == ref["surname"]
    assert digits(ours["phone"]) == digits(ref["phone"])
    assert ours["email"] == ref["email"]


def test_reference_golden_language_recall():
    """languages match the reference's own goldens exactly on the
    fixtures whose language sections survive layout linearization
    (resume2's is interleaved two-column — the junk filters must still
    recover the clean CEFR triplet)."""
    import os

    import pytest

    from resume_parser_service_spark.kernels.pdf_text import extract_pdf

    if not os.path.exists("/root/reference/cv_output/both_resume2.json"):
        pytest.skip("reference goldens not present")
    # CVENG's panel is Europass-interleaved — the mother-tongue/CEFR
    # panel detector (map-1.4.0) must recover the clean pair
    for pdf, golden in [("resume2.pdf", "both_resume2.json"),
                        ("FedericoElia.pdf", "resume.json"),
                        ("CVENG.pdf", "worse.json")]:
        r = extract_pdf(open(f"/root/reference/{pdf}", "rb").read())
        ours = map_resume(r["text"], r["links"])["languages"]
        ref = json.load(
            open(f"/root/reference/cv_output/{golden}"))["languages"]
        assert ours == ref, pdf


def test_personal_info_nonnull_coverage():
    """name+email+phone+surname non-null on ALL 5 reference PDFs
    (ratcheted from 4/5 in r3 — the r2 bar; VERDICT.md r2 item 3)."""
    import os

    import pytest

    from resume_parser_service_spark.kernels.pdf_text import extract_pdf

    if not os.path.exists("/root/reference/CVENG.pdf"):
        pytest.skip("reference fixtures not present")
    for name in ["CVENG", "FedericoElia", "resume1", "resume2", "resume3"]:
        r = extract_pdf(open(f"/root/reference/{name}.pdf", "rb").read())
        pi = map_resume(r["text"], r["links"])["personal_information"]
        assert all(pi.get(k) for k in ("name", "email", "phone",
                                       "surname")), name


def test_reference_golden_section_recall_floors():
    """Ratcheted per-section scalar-field recall vs the reference's own
    goldens (the COVERAGE.md table; metric in tools/mapper_recall.py —
    LLM-inferred fields like `industry` excluded). FedericoElia's one
    experience miss is the golden's date typo (PDF reads 11/2023, the
    golden says 11/2022); CVENG's education/experience floor is the
    known Europass two-column interleave limit."""
    import json
    import os

    import pytest

    from resume_parser_service_spark.kernels.pdf_text import extract_pdf
    from tools.mapper_recall import CASES, section_recall

    if not os.path.exists("/root/reference/cv_output/worse.json"):
        pytest.skip("reference goldens not present")
    floors = {  # (pdf, golden) -> (personal, education, experience)
        # personal is 1.0 on the canonicals since map-1.6.0 (country
        # from stated nationality + city table, full address render,
        # dial prefix from country, github.io, trunk-(0) collapse).
        # CVENG/worse experience: 44/48 — the misses are the golden's
        # own typo fix ("Scholarship" for the PDF's "Scolarship") and
        # LLM reassembly of column-split cells (map-1.5.0 Europass
        # grid reconstruction)
        ("CVENG.pdf", "worse.json"): (1.0, 1.0, 44 / 48),
        ("FedericoElia.pdf", "resume.json"): (1.0, 1.0, 11 / 12),
        ("resume2.pdf", "both_resume2.json"): (1.0, 1.0, 1.0),
        # cross-variant adjudication floors (r5, verdict item 6): the
        # alt-pipeline goldens that do NOT carry the canonical
        # goldens' known typos agree FULLY — proof the residual
        # canonical misses are golden noise, not mapper gaps.
        # FedericoElia: resume.json's one miss is its 11/2022 date
        # typo (the PDF reads 11/2023); these two variants have the
        # PDF's date and score 12/12.
        ("FedericoElia.pdf", "resume_quasi_perfetto.json"):
            (None, 1.0, 1.0),
        ("FedericoElia.pdf", "resume_wLinks.json"): (None, 1.0, 1.0),
        # CVENG: the mini-model variant without cell reassembly
        # agrees on every scalar experience field it extracted
        ("CVENG.pdf", "no_intermediary_ai_mini.json"): (None, None, 1.0),
    }
    mapped = {}
    for pdf in CASES:
        r = extract_pdf(open(f"/root/reference/{pdf}", "rb").read())
        mapped[pdf] = map_resume(r["text"], r["links"])
    for (pdf, golden), mins in floors.items():
        assert golden.rstrip("*") in [g.rstrip("*") for g in CASES[pdf]]
        ours = mapped[pdf]
        ref = json.load(open(f"/root/reference/cv_output/{golden}"))
        for sec, floor in zip(("personal_information",
                               "education_details",
                               "experience_details"), mins):
            if floor is None:
                continue
            got, exp = ours.get(sec), ref.get(sec)
            if sec == "personal_information":
                got, exp = [got] if got else [], [exp] if exp else []
            m, t = section_recall(got, exp)
            assert t == 0 or m / t >= floor, (pdf, golden, sec, m, t)


def test_reference_golden_section_recall():
    """Education / experience / language recall vs the reference's own
    golden for FedericoElia (cv_output/resume.json). 16/17 core fields
    match; the one known divergence is the golden's start-month typo
    (the PDF itself reads 11/2023, the golden says 11/2022)."""
    import os

    import pytest

    from resume_parser_service_spark.kernels.pdf_text import extract_pdf

    if not os.path.exists("/root/reference/cv_output/resume.json"):
        pytest.skip("reference goldens not present")
    ref = json.load(open("/root/reference/cv_output/resume.json"))
    r = extract_pdf(open("/root/reference/FedericoElia.pdf", "rb").read())
    m = map_resume(r["text"], r["links"])

    edu, gedu = m["education_details"][0], ref["education_details"][0]
    for k in ("education_level", "institution", "field_of_study",
              "final_evaluation_grade", "start_date"):
        assert str(edu[k]) == str(gedu[k]), k
    # our kernel is byte-faithful to the PDF's fi-ligature; the LLM
    # golden normalized it — compare NFKC-normalized keys
    import unicodedata

    def nfkc(keys):
        return {unicodedata.normalize("NFKC", k) for k in keys}
    assert nfkc(edu["exam"]) == nfkc(gedu["exam"])

    exps, gexps = m["experience_details"], ref["experience_details"]
    assert len(exps) == len(gexps) == 3
    for o, g in zip(exps, gexps):
        assert o["position"] == g["position"]
        assert o["company"] == g["company"]
        assert o["location"] == g["location"]
    assert exps[0]["employment_period"] == gexps[0]["employment_period"]
    # responsibilities: wrapped bullets merged, full sentences preserved
    assert exps[0]["key_responsibilities"] == gexps[0]["key_responsibilities"]

    assert m["languages"] == ref["languages"]


def test_europass_panel_all_caps_mother_tongue():
    """Some Europass templates render the mother tongue ALL CAPS
    ('MOTHER TONGUE(S): ITALIAN') — the panel detector must still fire
    and normalize the name (map-1.4.1)."""
    text = ("JOHN DOE\n"
            "MOTHER TONGUE(S): ITALIAN\n"
            "some interleaved body prose here\n"
            "ENGLISH mixed with other column text\n"
            "C1 C1 C1 C1 C1 other stuff\n")
    m = map_resume(text, [])
    assert m["languages"] == [
        {"language": "Italian", "proficiency": "Mother tongue"},
        {"language": "English", "proficiency": "C1"}]


def test_education_degree_label_rules_do_not_shadow():
    """r3 review findings: the colon-degree rule must require a FULL
    degree phrase (not 'Master thesis: X'), and the ALL-CAPS Europass
    prefix rule must not eat 'Master's Degree in X' lines."""
    from resume_parser_service_spark.kernels.resume_map import (
        _education_group)
    e = _education_group(["Master's Degree in Computer Science",
                          "University of Genoa", "2015 - 2017"])
    assert e["education_level"] == "Master's Degree"
    assert e["field_of_study"] == "Computer Science"
    assert e["institution"] == "University of Genoa"
    e2 = _education_group(["Master thesis: Deep Learning on Graphs",
                           "Master in Physics", "University of Genoa"])
    assert e2["education_level"] == "Master"
    assert e2["field_of_study"] == "Physics"
    e3 = _education_group(
        ["Bachelor of Science: Computer Information Systems -",
         "2014", "Columbia University, NY"])
    assert e3["education_level"] == "Bachelor of Science"
    assert e3["field_of_study"] == "Computer Information Systems"
    assert e3["institution"] == "Columbia University"
    assert e3["year_of_completion"] == "2014"
    e4 = _education_group(["MASTER'S DEGREE Università degli Studi"])
    assert e4["education_level"] == "MASTER'S DEGREE"
    assert e4["institution"] == "Università degli Studi"


def test_education_degree_label_case_and_token_variants():
    """r3 second-pass review: the colon-label rule must stay
    case-insensitive and keep the full _DEGREE_RE token set; the
    ALL-CAPS glued prefix must tolerate a lost apostrophe."""
    from resume_parser_service_spark.kernels.resume_map import (
        _education_group)
    e = _education_group(["BACHELOR OF SCIENCE: Computer Systems -"])
    assert e["education_level"] == "BACHELOR OF SCIENCE"
    assert e["field_of_study"] == "Computer Systems"
    e2 = _education_group(["B.S: Mathematics", "MIT"])
    assert e2["education_level"] == "B.S"
    assert e2["field_of_study"] == "Mathematics"
    e3 = _education_group(["Laurea Magistrale: Ingegneria Informatica"])
    assert e3["education_level"] == "Laurea Magistrale"
    e4 = _education_group(["MASTERS DEGREE Università di Bologna"])
    assert e4["education_level"] == "MASTERS DEGREE"
    assert e4["institution"] == "Università di Bologna"
    # thesis labels still rejected
    e5 = _education_group(["MASTER THESIS: Deep Learning"])
    assert e5["education_level"] is None


def test_dashed_company_name_not_split():
    """r3 third-pass review: only a COLUMN-GAP dash (>= 2 trailing
    spaces) splits a glued position-company head; a normal dashed
    company name under a bare period line stays whole."""
    from resume_parser_service_spark.kernels.resume_map import (
        _experience_group)
    e = _experience_group(["09/2015 to 05/2019",
                           "Merrill - Lynch Partners, New York"])
    assert e["company"] == "Merrill - Lynch Partners"
    assert e["position"] is None
    e2 = _experience_group(["09/2015 to 05/2019",
                            "Web Developer -  Luna Web Design, New York"])
    assert e2["position"] == "Web Developer"
    assert e2["company"] == "Luna Web Design"


def test_trailing_location_single_word_must_look_like_place():
    """r3 ADVICE: 'Ernst, Young' keeps its tail (org name), while
    'Columbia University, NY' and 'BlockChain Rush Italy' still
    split."""
    from resume_parser_service_spark.kernels.resume_map import (
        _strip_trailing_location)
    assert _strip_trailing_location("Ernst, Young") == ("Ernst, Young",
                                                       None)
    assert _strip_trailing_location("Columbia University, NY") == \
        ("Columbia University", "NY")
    assert _strip_trailing_location("BlockChain Rush Italy") == \
        ("BlockChain Rush", "Italy")


def test_eu_industry_continuation_anchors_on_cut_short_value():
    """r3 ADVICE: a complete short sector value followed by an
    unrelated short lowercase line must NOT merge; a value cut
    mid-phrase still picks up its wrapped continuation."""
    from resume_parser_service_spark.kernels.resume_map import (
        _eu_industry)
    # complete value, unrelated lowercase next line
    lines = ["Company sector: Retail, EDP", "sales assistant duties"]
    assert _eu_industry(lines, 0, range(len(lines))) == "Retail, EDP"
    # single-word cut + continuation
    lines2 = ["Company sector: Information", "technology"]
    assert _eu_industry(lines2, 0, range(len(lines2))) == \
        "Information technology"
    # trailing conjunction cut + continuation
    lines3 = ["Company sector: Engineering and", "construction"]
    assert _eu_industry(lines3, 0, range(len(lines3))) == \
        "Engineering and construction"


def test_resume2_bullets_match_reference_golden():
    """The sidebar unweaver (map-1.6.0) reproduces the reference
    LLM's disentangled responsibility bullets EXACTLY on the
    two-column resume2 fixture."""
    import os

    import pytest

    if not os.path.exists("/root/reference/cv_output/both_resume2.json"):
        pytest.skip("reference goldens not present")
    ref = json.load(open("/root/reference/cv_output/both_resume2.json"))
    from resume_parser_service_spark.kernels.pdf_text import extract_pdf
    r = extract_pdf(open("/root/reference/resume2.pdf", "rb").read())
    m = map_resume(r["text"], r["links"])
    assert (m["experience_details"][0]["key_responsibilities"]
            == ref["experience_details"][0]["key_responsibilities"])


def test_entry_header_accepts_brands_and_dotted_orgs():
    """r4 review: 'Acme Inc.' / 'eBay' headers still split entries;
    sentence fragments still don't."""
    from resume_parser_service_spark.kernels.resume_map import (
        _looks_like_entry_header, _split_period_entries)
    assert _looks_like_entry_header("Acme Inc.")
    assert _looks_like_entry_header("eBay")
    assert _looks_like_entry_header("iQuest Srl")
    assert not _looks_like_entry_header("issues immediately.")
    assert not _looks_like_entry_header(
        "Answer customer inquiries and resolve issues here.")
    g = ["Prev Corp", "Dev 01/2020 – 02/2021",
         "Acme Inc.", "Engineer 03/2021 – 04/2022"]
    assert len(_split_period_entries(g)) == 2


def test_unweave_requires_sidebar_label_before_stripping():
    """r4 review: number-leading body fragments ('5 Star Hotel,',
    '2020/2021 season') survive when no sidebar label precedes them."""
    from resume_parser_service_spark.kernels.resume_map import (
        _unweave_sidebar)
    body = ["5 Star Hotel, managed guest relations",
            "2020/2021 season revenue doubled"]
    assert _unweave_sidebar(body) == body
    # with a sidebar in play, contact fragments still strip
    woven = ["Contact", "+44 7700 900000 tasks completed on time"]
    assert _unweave_sidebar(woven) == ["tasks completed on time"]


def test_sidebar_address_stops_at_mobile_label():
    from resume_parser_service_spark.kernels.resume_map import (
        _labeled_sidebar_address)
    lines = ["Address:", "12 Foo Street,", "Mobile: 0791 234 567"]
    assert _labeled_sidebar_address(lines) == "12 Foo Street"
