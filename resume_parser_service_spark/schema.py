"""Spark schemas + canonical JSON serialization for the resume model.

StructType mirror of /root/reference/app/schemas/resume.py:6-141 with
field names/order as the prompt schema
(/root/reference/app/services/prompt.py:44-155). All scalars are
StringType — dates stay strings, union fields (``year_of_completion``,
``github``/``linkedin``/``link``) canonicalize to string, exactly as the
reference serializes them (/root/reference/app/schemas/resume.py:20-24,
42,60-66). ``exam`` is MapType(string,string)
(/root/reference/app/services/prompt.py:68-72).

``canonical_resume_json`` produces the single-line fixed-field-order
JSON string used for byte-identity checks (SURVEY.md §1.4).
"""

from __future__ import annotations

import json

from pyspark.sql.types import (ArrayType, DoubleType, FloatType, IntegerType,
                               LongType, MapType, StringType, StructField,
                               StructType, TimestampType, BinaryType)

__all__ = ["RESUME_SCHEMA", "EXTRACT_SCHEMA", "AUDIT_SCHEMA", "PAGES_SCHEMA",
           "canonical_resume_json", "MAX_FILE_SIZE"]

# Upload cap, from /root/reference/app/routers/resume_ingestor_router.py:26
MAX_FILE_SIZE = 10 * 1024 * 1024


def _s(name: str) -> StructField:
    return StructField(name, StringType())


_PERSONAL = StructType([_s(n) for n in (
    "name", "surname", "date_of_birth", "country", "city", "address",
    "zip_code", "phone_prefix", "phone", "email", "github", "linkedin")])

_EDUCATION = StructType(
    [_s(n) for n in ("education_level", "institution", "field_of_study",
                     "final_evaluation_grade", "start_date",
                     "year_of_completion")] +
    [StructField("exam", MapType(StringType(), StringType()))])

_EXPERIENCE = StructType(
    [_s(n) for n in ("position", "company", "employment_period", "location",
                     "industry")] +
    [StructField("key_responsibilities", ArrayType(StringType())),
     StructField("skills_acquired", ArrayType(StringType()))])

_PROJECT = StructType([_s("name"), _s("description"), _s("link")])
_NAMED = StructType([_s("name"), _s("description")])
_LANGUAGE = StructType([_s("language"), _s("proficiency")])

_LEGAL_FIELDS = [
    "eu_work_authorization", "us_work_authorization", "requires_us_visa",
    "legally_allowed_to_work_in_us", "requires_us_sponsorship",
    "requires_eu_visa", "legally_allowed_to_work_in_eu",
    "requires_eu_sponsorship", "canada_work_authorization",
    "requires_canada_visa", "legally_allowed_to_work_in_canada",
    "requires_canada_sponsorship", "uk_work_authorization",
    "requires_uk_visa", "legally_allowed_to_work_in_uk",
    "requires_uk_sponsorship"]

_WORK_PREF_FIELDS = [
    "remote_work", "in_person_work", "open_to_relocation",
    "willing_to_complete_assessments", "willing_to_undergo_drug_tests",
    "willing_to_undergo_background_checks"]

RESUME_SCHEMA = StructType([
    StructField("personal_information", _PERSONAL),
    StructField("education_details", ArrayType(_EDUCATION)),
    StructField("experience_details", ArrayType(_EXPERIENCE)),
    StructField("projects", ArrayType(_PROJECT)),
    StructField("achievements", ArrayType(_NAMED)),
    StructField("certifications", ArrayType(_NAMED)),
    StructField("languages", ArrayType(_LANGUAGE)),
    StructField("interests", ArrayType(StringType())),
    StructField("availability", StructType([_s("notice_period")])),
    StructField("salary_expectations",
                StructType([_s("salary_range_usd")])),
    StructField("self_identification", StructType(
        [_s(n) for n in ("gender", "pronouns", "veteran", "disability",
                         "ethnicity")])),
    StructField("legal_authorization",
                StructType([_s(n) for n in _LEGAL_FIELDS])),
    StructField("work_preferences",
                StructType([_s(n) for n in _WORK_PREF_FIELDS])),
])

PAGES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])

# mapInPandas output of the extraction kernel (flat; resume carried as
# canonical JSON, re-lifted to RESUME_SCHEMA JVM-side via from_json).
EXTRACT_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType()),
    StructField("lang", StringType()),
    StructField("doc_type", StringType()),
    StructField("status", StringType()),
    StructField("error_class", StringType()),
    StructField("text", StringType()),
    StructField("links", ArrayType(StringType())),
    StructField("resume_json", StringType()),
    StructField("flat_text", StringType()),
    StructField("vector", ArrayType(FloatType())),
    StructField("n_pages", IntegerType()),
    StructField("n_chars", LongType()),
    StructField("n_links", IntegerType()),
    StructField("extract_ms", DoubleType()),
    StructField("kernel_version", StringType()),
])

AUDIT_SCHEMA = StructType([
    StructField("run_id", StringType()),
    StructField("snapshot_id", LongType()),
    StructField("partition_id", IntegerType()),
    StructField("url", StringType()),
    StructField("doc_type", StringType()),
    StructField("status", StringType()),
    StructField("error_class", StringType()),
    StructField("n_pages", IntegerType()),
    StructField("n_chars", LongType()),
    StructField("n_links", IntegerType()),
    StructField("extract_ms", DoubleType()),
    StructField("kernel_version", StringType()),
    StructField("committed_at", TimestampType()),
])


def canonical_resume_json(resume: dict) -> str:
    """Single-line JSON with frozen field order (construction order of
    kernels.resume_map.empty_resume); ``exam`` map keys sorted for
    total determinism."""
    import copy

    # plain deepcopy — the only need is not mutating the caller's dict
    # before the exam-sort below
    out = copy.deepcopy(resume)
    eds = out.get("education_details")
    if eds:
        for ed in eds:
            if isinstance(ed, dict) and isinstance(ed.get("exam"), dict):
                ed["exam"] = dict(sorted(ed["exam"].items()))
    return json.dumps(out, ensure_ascii=False, separators=(",", ":"))
