import pytest


@pytest.fixture(scope="session")
def spark():
    from resume_parser_service_spark.session import get_spark
    s = get_spark(app_name="rps-tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture()
def valid_resume_data():
    """Complete schema-conformant resume dict, mirroring the reference's
    fixture at /root/reference/app/tests/conftest.py:201-289."""
    return {
        "personal_information": {
            "name": "Jane", "surname": "Doe", "date_of_birth": "01/02/1990",
            "country": "Ireland", "city": "Dublin", "address": "1 Main St",
            "zip_code": "D01XY45", "phone_prefix": "+353",
            "phone": "871234567", "email": "jane.doe@example.com",
            "github": "https://github.com/janedoe",
            "linkedin": "https://linkedin.com/in/janedoe"},
        "education_details": [{
            "education_level": "Master", "institution": "Trinity College",
            "field_of_study": "Computer Science",
            "final_evaluation_grade": "First", "start_date": "2012",
            "year_of_completion": "2014",
            "exam": {"Algorithms": "A", "Databases": "B+"}}],
        "experience_details": [{
            "position": "Engineer", "company": "Acme",
            "employment_period": "Jan 2015 - Dec 2018",
            "location": "Dublin, Ireland", "industry": "Software",
            "key_responsibilities": ["built pipelines", "ran oncall"],
            "skills_acquired": ["spark", "python"]}],
        "projects": [{"name": "proj", "description": "desc",
                      "link": "https://github.com/janedoe/proj"}],
        "achievements": [{"name": "Award", "description": "won"}],
        "certifications": [{"name": "Cert", "description": "certified"}],
        "languages": [{"language": "English", "proficiency": "Native"}],
        "interests": ["chess", "running"],
        "availability": {"notice_period": "1 month"},
        "salary_expectations": {"salary_range_usd": "90000-110000"},
        "self_identification": {"gender": "F", "pronouns": "she/her",
                                "veteran": "No", "disability": "No",
                                "ethnicity": "White"},
        "legal_authorization": {k: "Yes" for k in (
            "eu_work_authorization", "us_work_authorization",
            "requires_us_visa", "legally_allowed_to_work_in_us",
            "requires_us_sponsorship", "requires_eu_visa",
            "legally_allowed_to_work_in_eu", "requires_eu_sponsorship",
            "canada_work_authorization", "requires_canada_visa",
            "legally_allowed_to_work_in_canada",
            "requires_canada_sponsorship", "uk_work_authorization",
            "requires_uk_visa", "legally_allowed_to_work_in_uk",
            "requires_uk_sponsorship")},
        "work_preferences": {k: "Yes" for k in (
            "remote_work", "in_person_work", "open_to_relocation",
            "willing_to_complete_assessments",
            "willing_to_undergo_drug_tests",
            "willing_to_undergo_background_checks")},
    }
